package graft

import org.apache.spark.sql.functions._

/** Marginal-cost probe for the iterative graph family — bench
  * hygiene, not engine code: the six graph queries are the suite's
  * steady top block (~16 s at sf0.1) and each rebuilds the SAME
  * supplier→customer edge table from lineitem ⋈ orders before
  * iterating. This main builds that edge table ONCE, caches it, and
  * times each algorithm against the cached edges, so the recorded
  * numbers separate "the graph algorithm got slower" from "the scan
  * /join feeding it got slower" — the decomposition a per-query bench
  * cannot give. Per-query semantics are untouched; results are pinned
  * as a table in BASELINE.md.
  *
  * `runMain graft.GraphMarginal [sfDir]` → one JSON line:
  * edge-build seconds (scan + join + persist + count), then per-
  * algorithm marginal seconds on the warm cache, same arguments as
  * the gate queries. */
object GraphMarginal {

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = core.Session.local("graft-graph-marginal")
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warmup on a toy graph BEFORE anything is timed: the
    // bench pins these numbers sit beside come from a long-warm
    // session (hundreds of queries), so an unwarmed probe would
    // overstate every algorithm by seconds of first-plan compilation
    {
      val toy = spark.range(200)
        .selectExpr("id % 20 as src", "(id * 7) % 20 as dst")
      operators.Graph.pageRank(toy, iterations = 5)
        .write.format("noop").mode("overwrite").save()
      operators.Graph.hits(toy, iterations = 4)
        .write.format("noop").mode("overwrite").save()
      operators.Graph.personalizedPageRank(toy, Seq(1L), iterations = 5)
        .write.format("noop").mode("overwrite").save()
      graft.core.Checkpoints.freeAllPersisted(spark)
    }

    val t0 = System.nanoTime()
    val e = core.Tables.lineitem(spark, sfDir)
      .join(core.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))
      .persist()
    val nEdges = e.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    def time(name: String)(df: => org.apache.spark.sql.DataFrame)
        : (String, Double) = {
      // best of 2: the first run of each algorithm pays codegen/JIT
      // for ITS plan shapes, which is session cost, not algorithm cost
      // (the Bench best-of-N rule)
      val secs = (1 to 2).map { _ =>
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t) / 1e9
        // iterative operators leave checkpoint blocks; free them so one
        // run's leftovers never squeeze the next (the Bench rule). The
        // sweep also frees the shared edge cache — rewarm it OUTSIDE
        // the timed window so every run starts from the same state.
        graft.core.Checkpoints.freeAllPersisted(spark)
        e.persist(); e.count()
        sec
      }
      name -> secs.min
    }

    val results = Seq(
      time("pagerank") { operators.Graph.pageRank(e, iterations = 5) },
      time("personalized_pagerank") {
        operators.Graph.personalizedPageRank(e, Seq(1L, 2L, 3L), iterations = 5)
      },
      time("hits") { operators.Graph.hits(e, iterations = 4) })

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"graph_marginal","edge_build_sec":${f"$buildSec%.3f"},"n_edges":$nEdges,"algorithms":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
