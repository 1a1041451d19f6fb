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

    // the SECOND shared family: the 300-node orders-mod graph that
    // q_kcore / q_ktruss / q_label_propagation / q_assortativity /
    // q_modularity all rebuild (same fixture arithmetic as the gate
    // queries — pmod(o_orderkey, 13) < 2, keys mod 300)
    val t1 = System.nanoTime()
    val e2 = core.Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(13L)) < 2)
      .select(pmod(col("o_custkey"), lit(300L)).as("src"),
        pmod(col("o_orderkey"), lit(300L)).as("dst"))
      .persist()
    val nEdges2 = e2.count()
    val buildSec2 = (System.nanoTime() - t1) / 1e9

    def time2(name: String)(df: => org.apache.spark.sql.DataFrame)
        : (String, Double) = {
      val secs = (1 to 2).map { _ =>
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t) / 1e9
        graft.core.Checkpoints.freeAllPersisted(spark)
        e2.persist(); e2.count()
        sec
      }
      name -> secs.min
    }

    val results2 = Seq(
      time2("kcore") { operators.Graph.kCore(e2, k = 11, rounds = 6) },
      time2("ktruss") { operators.Graph.kTruss(e2, k = 4, rounds = 3) },
      time2("label_propagation") {
        operators.Graph.labelPropagation(e2, rounds = 4)
      },
      time2("assortativity") { operators.Graph.assortativity(e2) },
      time2("modularity") {
        operators.Graph.modularity(e2,
          operators.Graph.labelPropagation(e2, rounds = 4))
      })

    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    println(s"""{"metric":"graph_marginal","edge_build_sec":${f"$buildSec%.3f"},"n_edges":$nEdges,"algorithms":${fmt(results)},"edge2_build_sec":${f"$buildSec2%.3f"},"n_edges2":$nEdges2,"algorithms2":${fmt(results2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
