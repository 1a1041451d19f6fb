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

  test("hits: hand-traced two iterations on a tiny hub/authority chain") {
    // 1->3, 2->3, 3->4: nodes 1,2 are pure hubs, 3 is the authority
    // (and a weak hub via 4). With scale=100, two iterations give
    // hub (100, 100, 25, 0), auth (0, 0, 100, 25) — floor-exact.
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.hits(e, iterations = 2, scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((100L, 0L)) && out(2L) == ((100L, 0L)))
    assert(out(3L) == ((25L, 100L)) && out(4L) == ((0L, 25L)))
  }

  test("hits: deterministic across repartitionings; values bounded by scale") {
    val edges = (for (k <- 1L to 300L)
      yield ((k * 7) % 40, (k * 13) % 37 + 40)).toDF("src", "dst")
    val a = Graph.hits(edges.repartition(13), iterations = 4)
      .collect().map(_.toSeq).toSet
    val b = Graph.hits(edges.coalesce(1), iterations = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    assert(a.forall { s =>
      val h = s(1).asInstanceOf[Long]; val au = s(2).asInstanceOf[Long]
      h >= 0L && h <= 1000000L && au >= 0L && au <= 1000000L
    })
  }

  test("harmonicCentrality: exact layers on a path graph; direction ignored") {
    // path 1-2-3-4-5: node 1 sees {2}@1 {3}@2 {4}@3; node 3 sees
    // {2,4}@1 {1,5}@2 and nothing at 3 — counts exact, constants fixed
    val e = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L)).toDF("src", "dst")
    val out = Graph.harmonicCentrality(e, radius = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1.0 + 0.5 + 0.333333333)))
    assert(out(2L) == ((2L, 1L, 1L, 2.0 + 0.5 + 0.333333333)))
    assert(out(3L) == ((2L, 2L, 0L, 3.0)))
    assert(out(5L) == out(1L))
    // deterministic across partitionings
    val a = Graph.harmonicCentrality(e.repartition(4), radius = 3)
      .collect().map(_.toSeq).toSet
    assert(a == Graph.harmonicCentrality(e.coalesce(1), radius = 3)
      .collect().map(_.toSeq).toSet)
  }

  test("triangles: exact set on a known graph; dedup, loops, direction ignored") {
    // K4 on {1,2,3,4} (4 triangles) + square 5-6-7-8 (0 triangles) +
    // pendant 4-9; duplicates, reversals and a self-loop must not count
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val square = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))
    val noise = Seq((2L, 1L), (1L, 2L), (3L, 3L), (4L, 9L))
    val e = (k4 ++ square ++ noise).toDF("src", "dst")
    val tri = Graph.triangles(e).collect()
      .map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.length === 4, s"expected 4 triangle rows, got ${tri.length}")
    assert(tri.toSet === Set(
      Set(1L, 2L, 3L), Set(1L, 2L, 4L), Set(1L, 3L, 4L), Set(2L, 3L, 4L)))
    // every output row is (wedge center, then rank-ordered endpoints):
    // deterministic canonical form — no duplicate orientations
    assert(tri.distinct.length === tri.length)
  }

  test("triangles: hub never becomes a wedge center (orientation bound)") {
    // star: hub 0 connected to 1..20, plus one closing edge (1,2) ->
    // exactly ONE triangle; the hub's 20 edges must not generate
    // C(20,2) wedges — the closing count proves orientation ran
    val star = (1L to 20L).map(l => (0L, l))
    val e = (star ++ Seq((1L, 2L))).toDF("src", "dst")
    val tri = Graph.triangles(e).collect()
    assert(tri.length === 1)
    assert(Set(tri.head.getLong(0), tri.head.getLong(1),
      tri.head.getLong(2)) === Set(0L, 1L, 2L))
    // low-degree vertex is the center under (degree, id) order
    assert(tri.head.getLong(0) === 1L)
  }

  test("personalizedPageRank: seeds-only teleport; all-seeds == plain PageRank") {
    val edges = (1L to 50L).map(i => (i, (i * 7) % 50 + 1))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // with EVERY node seeded, the formula degenerates to plain PageRank
    val ppr = Graph.personalizedPageRank(edges.toDF("src", "dst"), nodes, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pr = Graph.pageRank(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ppr == pr)
  }

  test("personalizedPageRank: mass diffuses outward from the seed") {
    // chain 1 -> 2 -> 3 -> 4, seed = 1: rank strictly decreases with
    // distance from the seed, and an unreachable node (10 -> 11 branch)
    // gets zero
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val r = Graph.personalizedPageRank(edges.toDF("src", "dst"), Seq(1L), 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L))
    assert(r(10L) == 0L && r(11L) == 0L)
  }

  test("kCore: clique survives, pendants and their cascade peel off") {
    // K5 on {1..5} (every vertex degree 4) + a pendant chain 5-10-11:
    // at k=3 the whole chain (degrees 1 and 2) peels while the clique
    // is untouched; residual degrees are all 4
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val e = (k5 ++ Seq((5L, 10L), (10L, 11L))).toDF("src", "dst")
    val core = Graph.kCore(e, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(core.values.forall(_ == 4L))
  }

  test("kCore: bounded rounds stop mid-cascade deterministically") {
    // path 1-2-3-4-5 at k=2: each round removes the two endpoints;
    // ONE round leaves the inner path 2-3-4, two rounds leave just 3's
    // edges gone (empty), so rounds is a real semantic parameter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val one = Graph.kCore(path, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(2L, 3L, 4L))
    // after round 1 the edges are (2,3),(3,4); round 2 peels 2 and 4
    // (degree 1), leaving no edges at all -> empty output
    val two = Graph.kCore(path, k = 2, rounds = 2)
      .collect().map(_.getLong(0)).toSet
    assert(two.isEmpty)
  }

  test("kCore: dedup, self-loops and direction are normalized away") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L), (3L, 1L))
      .toDF("src", "dst")
    // triangle 1-2-3: every vertex residual degree 2 at k=2
    val core = Graph.kCore(e, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: deterministic across repartitionings; checkpoint path runs") {
    val edges = (1L to 200L).map(i => (i % 40, (i * 7) % 40)).toDF("src", "dst")
    val a = Graph.kCore(edges.repartition(11), k = 4, rounds = 8,
      checkpointInterval = 2).collect().map(_.toSeq).toSet
    val b = Graph.kCore(edges.coalesce(1), k = 4, rounds = 8,
      checkpointInterval = 2).collect().map(_.toSeq).toSet
    assert(a == b)
  }
  test("adamicAdar: hand-computed scores on the two-wedge graph") {
    // 1-3, 2-3, 1-4, 2-4: pair (1,2) has common neighbors {3, 4},
    // both of degree 2 -> aa = 2/ln(2); pair (3,4) symmetric with
    // centers 1, 2 of degree 2 -> same score. No other non-adjacent
    // pair shares a neighbor.
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    val out = Graph.adamicAdar(edges.toDF("src", "dst"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val exp = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set((1L, 2L), (3L, 4L)))
    assert(out((1L, 2L)) == ((2L, exp)))
    assert(out((3L, 4L)) == ((2L, exp)))
  }

  test("adamicAdar: existing edges are excluded; hub cap drops wedge centers") {
    // triangle 1-2-3 plus pendant 4-1: (2,3) adjacent -> excluded even
    // though they share neighbor 1; (2,4)/(3,4) share only hub 1
    // (degree 3), so maxHubDeg = 2 must erase them entirely.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L))
    val full = Graph.adamicAdar(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((2L, 4L), (3L, 4L)), "adjacent pairs never score")
    val capped = Graph.adamicAdar(edges.toDF("src", "dst"), maxHubDeg = 2L)
      .count()
    assert(capped == 0L, "capped hub centers contribute no wedges")
  }

  test("adamicAdar: deterministic across repartitionings") {
    val edges = (1L to 60L).map(i => (i, (i * 11) % 60 + 1))
    val a = Graph.adamicAdar(edges.toDF("src", "dst").repartition(13))
      .collect().map(_.toSeq).toSet
    val b = Graph.adamicAdar(edges.toDF("src", "dst").coalesce(1))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation: disjoint cliques collapse onto their minimum id") {
    val clique1 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val clique2 = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val out = Graph.labelPropagation((clique1 ++ clique2).toDF("src", "dst"),
      rounds = 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(out(_) == 0L), s"clique1: $out")
    assert((10L to 13L).forall(out(_) == 10L), s"clique2: $out")
  }

  test("labelPropagation: orientation-invariant (symmetrized internally)") {
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L))
    val rev = fwd.map(_.swap)
    val a = Graph.labelPropagation(fwd.toDF("src", "dst"), rounds = 3)
      .collect().map(_.toSeq).toSet
    val b = Graph.labelPropagation(rev.toDF("src", "dst"), rounds = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation: deterministic across repartitionings") {
    val edges = (1L to 80L).map(i => (i, (i * 13) % 80 + 1))
    val a = Graph.labelPropagation(edges.toDF("src", "dst").repartition(11), rounds = 4)
      .collect().map(_.toSeq).toSet
    val b = Graph.labelPropagation(edges.toDF("src", "dst").coalesce(1), rounds = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("kTruss: the 4-clique survives k=4, a pendant triangle does not") {
    // K4 on 1..4 (every edge closes 2 triangles) plus a triangle
    // 4-5-6 hanging off (each of its edges closes only 1)
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val pendant = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val out = Graph.kTruss((k4 ++ pendant).toDF("src", "dst"), k = 4,
      rounds = 2).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == k4.toSet, s"got ${out.keySet}")
    assert(out.values.forall(_ == 2L), "every K4 edge sits in 2 triangles")
  }

  test("kTruss: support recount on the final set; orientation-invariant") {
    val fwd = (for (i <- 1L to 5L; j <- 1L to 5L if i < j) yield (i, j))
    val a = Graph.kTruss(fwd.toDF("src", "dst"), k = 5, rounds = 2)
      .collect().map(_.toSeq).toSet
    val b = Graph.kTruss(fwd.map(_.swap).toDF("src", "dst"), k = 5, rounds = 2)
      .collect().map(_.toSeq).toSet
    // K5: every edge in 3 triangles -> 5-truss intact either way
    assert(a == b && a.size == 10 && a.forall(_(2) == 3L))
  }

  test("kTruss: deterministic across repartitionings") {
    val edges = (1L to 90L).map(i => (i, (i * 7) % 90 + 1)) ++
      (1L to 90L).map(i => (i, (i * 11) % 90 + 1))
    val a = Graph.kTruss(edges.toDF("src", "dst").repartition(13), k = 3,
      rounds = 2).collect().map(_.toSeq).toSet
    val b = Graph.kTruss(edges.toDF("src", "dst").coalesce(1), k = 3,
      rounds = 2).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("assortativity: star is -1, path is -0.5, regular graph NULL") {
    // star: the hub (deg 3) only touches leaves (deg 1)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val rs = Graph.assortativity(star).collect().head
    assert(rs.getLong(0) == 4 && rs.getLong(1) == 3)
    assert(rs.getDouble(2) == -1.0)
    // path 0-1-2-3: hand-computed -0.5
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.assortativity(path).collect().head.getDouble(2) == -0.5)
    // 4-cycle: degree-regular -> zero variance -> NULL, loudly not NaN
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    assert(Graph.assortativity(cyc).collect().head.isNullAt(2))
  }

  test("modularity: two-triangle split 0.357143; one community 0; " +
      "singletons negative") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L),
      (3L, 5L), (2L, 3L)).toDF("src", "dst")
    val tri = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 1L)).toDF("id", "community")
    val r = Graph.modularity(edges, tri).collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 7 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.357143)
    // everything in one community: Q = 0 exactly
    val one = Seq.tabulate(6)(i => (i.toLong, 0L)).toDF("id", "community")
    assert(Graph.modularity(edges, one).collect().head.getDouble(3) == 0.0)
    // all singletons: no internal edges, Q strictly negative
    val single = Seq.tabulate(6)(i => (i.toLong, i.toLong))
      .toDF("id", "community")
    assert(Graph.modularity(edges, single).collect().head.getDouble(3) < 0.0)
  }
}
