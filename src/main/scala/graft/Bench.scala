package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every suite query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line of per-query wall seconds.
  *
  * Results are forced through the `noop` sink, not `count()`: count lets
  * Catalyst prune projections (a map-only query would measure nothing),
  * while noop executes the full physical plan and discards rows.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.core.Session.cpus.toString
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + parquet-footer warmup so query 1 doesn't pay session costs.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val metrics = new graft.core.MetricsListener
    spark.listenerManager.register(metrics)

    val results = Queries.all.map { case (name, (fn, _)) =>
      metrics.label(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // listener callbacks are async: wait for this query's event before
      // relabeling, or shuffle bytes get attributed to the next query
      var tries = 0
      while (ok && metrics.get(name).isEmpty && tries < 30) {
        Thread.sleep(100); tries += 1
      }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val shuffleMb = results.map { case (k, _) =>
      val mb = metrics.get(k).map(_.shuffleBytes / 1e6).getOrElse(0.0)
      "\"" + k + "\":" + f"$mb%.1f"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$shuffleMb,"sf":"$sfDir"}""")
    spark.stop()
  }
}
