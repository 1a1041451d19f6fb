package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local-mode defaults mirror what a production cluster deployment would
  * set: AQE on (runtime partition coalescing + skew-join splitting),
  * shuffle partitions sized to available parallelism rather than the 200
  * default, UTC session timezone so timestamp semantics match the DuckDB
  * oracle, and broadcast threshold left at default so Catalyst
  * auto-broadcasts the small dimension tables (region/nation/supplier).
  *
  * At 100 TB the same code runs unchanged on a real cluster; only
  * `master` and the shuffle-partition count (sized ~2-3x total cores,
  * or left to AQE's coalescing from a high initial value) differ.
  */
object Session {
  def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(Runtime.getRuntime.availableProcessors, 32))

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalesces post-shuffle partitions by SIZE; its parallelism
      // floor is minPartitionSize (1 MB default), so a CPU-heavy stage
      // whose rows are compact — candidate-pair joins feeding per-pair
      // set merge-walks, pointer-jumping iterations — collapses to 1-3
      // tasks and runs the merge CPU single-threaded (measured 30-100×
      // on the 10× soak: verify 192 s on 3 MB of pairs). 64 KB keeps
      // such stages at full parallelism while still coalescing truly
      // empty partitions; byte-heavy stages are unaffected (they hit
      // the advisory size first).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      // static (plan-time) conf for the TIMESTAMP(NANOS) events table —
      // set once here, never mutated by loaders (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
