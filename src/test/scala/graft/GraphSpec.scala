package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star hub out-ranks its leaves; symmetric pair ties exactly") {
    // leaves 1..4 all point at hub 0; 10 <-> 11 point at each other
    val edges = (1L to 4L).map(l => (l, 0L)) ++ Seq((10L, 11L), (11L, 10L))
    val ranks = Graph.pageRank(edges.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L), "hub must out-rank a leaf")
    assert(ranks(10L) == ranks(11L), "symmetric nodes must tie EXACTLY")
    assert((1L to 4L).map(ranks).toSet.size == 1, "identical leaves tie")
  }

  test("pageRank: fixed-point mass is bounded by scale and non-negative") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val ranks = Graph.pageRank(edges.toDF("src", "dst"), iterations = 5,
      scale = 1000000L).collect().map(_.getLong(1))
    assert(ranks.forall(_ >= 0))
    // floor division only loses mass, never creates it
    assert(ranks.sum <= 1000000L)
  }

  test("pageRank: deterministic across repartitionings of the edge list") {
    val edges = (1L to 50L).map(i => (i, (i * 7) % 50 + 1))
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(edges.toDF("src", "dst").coalesce(1), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
