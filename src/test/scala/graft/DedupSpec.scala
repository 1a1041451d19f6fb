package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different words about distributed columnar query engines"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup: min-id survivor with copy count") {
    val out = Dedup.exact(docs, "doc_id", Seq("text")).orderBy("doc_id")
      .select("doc_id", "n_copies").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("shingles: distinct 3-grams, empty when too short") {
    val sh = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(Dedup.shingles(org.apache.spark.sql.functions.col("text")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).toSet == Set("a_b_c", "b_c_d"))
    assert(sh(1).isEmpty)
  }

  test("jaccardPairs finds near-dups and exact dups with correct scores") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 4L).get
    assert(exact._3 == 1.0)
  }

  test("minhashDedup candidates+verify match all-pairs truth") {
    val out = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.6)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("duplicateClusters: transitive components get the min id as canonical") {
    // graph: {1-2, 2-5} one component (canonical 1), {7-9} another
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("duplicateClusters: 1000-node path converges within pointer-jumping budget") {
    // worst-case diameter for the default maxIter=20: a single chain
    // 0-1-2-...-999. Plain min-propagation needs ~1000 iterations;
    // pointer jumping needs ~log2(1000) ≈ 10 — if the hop is broken
    // this throws the non-convergence error instead of silently
    // returning partial labels.
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 1000)
    assert(out.forall(_._2 == 0L), "every chain node must resolve to min id 0")
  }

  test("MinSigAggregator: aggregate of docs == signature of their shingle union") {
    import org.apache.spark.sql.functions.col
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 32)
    // typed aggregation of per-doc signatures
    val agg = new graft.plans.MinSigAggregator(32).toColumn
    val merged = sigs.select(col("sig")).as[Seq[Long]]
      .select(agg.name("s")).collect().head
    // ground truth: signature of the UNION OF SHINGLE SETS (not of the
    // concatenated text, which would add new boundary shingles)
    val unionShingles = Dedup.shingleSets(docs, "doc_id", "text")
      .select(org.apache.spark.sql.functions.explode(col("sh")).as("s"))
      .distinct().collect().map(_.getString(0))
    val unionSig = graft.plans.SketchExpressions.computeSignature(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        unionShingles.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any)),
      numHashes = 32).toLongArray().toSeq
    assert(merged == unionSig)
  }

  test("jaccardJoin: cross-relation pairs match brute-force truth, self-pairs allowed") {
    val left = docs.filter("doc_id % 2 = 1")  // docs 1, 3
    val right = docs.filter("doc_id % 2 = 0") // docs 2, 4
    val out = Dedup.jaccardJoin(left, right, "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1~2 near-dup, 1~4 exact dup, 3 matches nothing
    assert(out.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L)))
    assert(out.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
  }

  test("jaccardJoin equals jaccardPairs restricted to the bipartition") {
    val left = docs.filter("doc_id % 2 = 1")
    val right = docs.filter("doc_id % 2 = 0")
    val cross = Dedup.jaccardJoin(left, right, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1))).toSet
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 % 2 != p._2 % 2)
      .map(p => (p._1 min p._2, p._1 max p._2)).toSet
    assert(cross == all)
  }

  test("minhashJoin: cross-relation LSH candidates+verify equal jaccardJoin") {
    val left = docs.filter("doc_id % 2 = 1")
    val right = docs.filter("doc_id % 2 = 0")
    val lsh = Dedup.minhashJoin(left, right, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardJoin(left, right, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact && exact.nonEmpty)
  }

  test("containmentJoin: short doc inside long doc scores 1.0, jaccard would not") {
    val shortDoc = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val longDocs = Seq(
      (20L, "intro words alpha beta gamma delta plus a very long tail of extra content here"),
      (21L, "nothing shared with the query document at all in any way")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentJoin(shortDoc, longDocs, "doc_id", "text",
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((10L, 20L, 1.0)))
    // sanity: symmetric jaccard on the same pair is far below 0.9
    val j = Dedup.jaccardJoin(shortDoc, longDocs, "doc_id", "text",
      threshold = 0.9).count()
    assert(j == 0)
  }

  test("containmentJoin matches brute-force containment on the fixture docs") {
    val left = docs.filter("doc_id % 2 = 1")
    val right = docs.filter("doc_id % 2 = 0")
    val got = Dedup.containmentJoin(left, right, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force via shingle sets
    val sets = Dedup.shingleSets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      (a, sa) <- sets.toSeq; if a % 2 == 1
      (b, sb) <- sets.toSeq; if b % 2 == 0
      if sa.intersect(sb).size.toDouble / sa.size >= 0.5
    } yield (a, b)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("passageDedup: first occurrence survives, repeats drop, docs reassemble") {
    val corpus = Seq(
      (1L, "a b c d e f"),   // passages (k=3): "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" repeats doc 1 pos 0 -> dropped
      (3L, "d e f"),         // entire doc already seen -> vanishes
      (4L, "x y z a b")      // "x y z" repeats doc 2; tail passage "a b" is new
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c d e f", 2L -> "x y z", 4L -> "a b"))
  }

  test("passageDedup: duplicate passage inside ONE doc keeps only first") {
    val corpus = Seq((7L, "p q r p q r s")).toDF("doc_id", "text")
    val out = Dedup.passageDedup(corpus, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(7L -> "p q r s"))
  }

  test("weighted simhash: repeated-token spam can't drag a doc toward a dup") {
    import graft.plans.SketchExpressions.{computeSimhash, computeSimhashWeighted}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val spam = base + (" viagra" * 50)
    // unweighted: 50 repeats of one token dominate the bit votes
    val unweightedDist = java.lang.Long.bitCount(
      computeSimhash(u(base)) ^ computeSimhash(u(spam)))
    val weightedDist = java.lang.Long.bitCount(
      computeSimhashWeighted(u(base), 2) ^ computeSimhashWeighted(u(spam), 2))
    assert(weightedDist < unweightedDist)
    // cap=1 on distinct-token text equals the unweighted sketch
    val distinctText = "one two three four five"
    assert(computeSimhashWeighted(u(distinctText), 1) ==
      computeSimhash(u(distinctText)))
  }

  test("stripBoilerplate: frequent template passages go, content stays, pure-template docs drop") {
    // k=2 passages; "click here" opens 3 of 4 docs in src1 → boilerplate
    val in = Seq(
      (1L, "src1", "click here alpha beta gamma delta"),
      (2L, "src1", "click here epsilon zeta eta theta"),
      (3L, "src1", "click here"),                        // pure boilerplate
      (4L, "src1", "iota kappa lambda mu"),              // untouched
      (5L, "src2", "click here nu xi")                   // same text, other source: df=1 there
    ).toDF("doc_id", "source", "text")
    val out = Dedup.stripBoilerplate(in, "doc_id", "text", "source",
      k = 2, minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha beta gamma delta",
      2L -> "epsilon zeta eta theta",
      4L -> "iota kappa lambda mu",
      5L -> "click here nu xi")) // doc 3 dropped entirely
  }

  test("duplicateSpans: shared k-gram runs become maximal merged spans") {
    // k=3: docs 10/11 share the 5-token run "a b c d e" → grams at
    // positions 0,1,2 merge into one span [0,5) in doc 10, [1,6) in 11;
    // doc 12 shares nothing 3 tokens long
    val in = Seq(
      (10L, "a b c d e x y"),
      (11L, "z a b c d e q"),
      (12L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(in, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((10L, 0L, 5L, 5L), (11L, 1L, 6L, 5L)))
  }

  test("duplicateSpans: disjoint duplicated runs stay separate spans") {
    // "a b c" (pos 0) and "x y z" (pos 4) both duplicated, gap at pos 3
    val in = Seq(
      (1L, "a b c q x y z"),
      (2L, "a b c"),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(in, "doc_id", "text", k = 3)
      .filter($"doc_id" === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((0L, 3L), (4L, 7L)))
  }

  test("stripDuplicateSpans: covered tokens cut, clean docs untouched, full dups vanish") {
    val in = Seq(
      (10L, "a b c d e x y"),
      (11L, "z a b c d e q"),
      (12L, "p q r s t u v"),
      (13L, "a b c d e"),   // fully covered (duplicated against 10/11)
      (14L, "a b c d e")    // its exact twin
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(in, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "x y", 11L -> "z q", 12L -> "p q r s t u v"))
  }

  test("simhash: identical docs collide, unrelated docs differ") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(4L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 3)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, bands = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("clusterBest: argmax by (score desc, id asc) with exact sizes") {
    // clusters {1,2,3} (canonical 1) and {7,8} (canonical 7);
    // scores make 2 the best of the first cluster; 7/8 tie exactly ->
    // the LOWER id wins the tie
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "canonical_id")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (7L, 0.4), (8L, 0.4),
      (99L, 1.0)) // 99 is in no cluster: must not appear
      .toDF("doc_id", "score")
    val out = Dedup.clusterBest(clusters, scores, "doc_id", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out == Map(1L -> ((2L, 0.9, 3L)), 7L -> ((7L, 0.4, 2L))))
  }

  test("clusterBest: deterministic across repartitionings") {
    val clusters = (1L to 60L).map(i => (i, i % 6)).toDF("doc_id", "canonical_id")
    val scores = (1L to 60L).map(i => (i, (i * 13 % 7) / 7.0)).toDF("doc_id", "score")
    val a = Dedup.clusterBest(clusters.repartition(7), scores.repartition(5),
      "doc_id", "score").collect().map(_.toSeq).toSet
    val b = Dedup.clusterBest(clusters.coalesce(1), scores.coalesce(1),
      "doc_id", "score").collect().map(_.toSeq).toSet
    assert(a == b)
  }
  test("winnowFingerprints: a shared >= k+w-1 substring yields a shared fingerprint") {
    // the winnowing guarantee: any common substring of length >=
    // k + w - 1 = 8 produces at least one common (hash) selection
    val docs = Seq(
      (1L, "xxxxTHEQUICKFOXyyyyyy"),
      (2L, "aaaaaaaTHEQUICKFOXbbb"),
      (3L, "zzzzzzzzzzzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val f3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "shared substring must share a fingerprint")
    assert((f1 & f3).isEmpty, "no shared 5-gram, no shared fingerprint")
  }

  test("winnowFingerprints: short docs drop; gap between selections <= w") {
    val docs = Seq((1L, "1234567"), (2L, "abcdefghijklmnopqrstuvwxyz0123456789"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!out.exists(_._1 == 1L), "len 7 < k + w - 1 = 8 has no full window")
    val ps = out.filter(_._1 == 2L).map(_._2).sorted
    assert(ps.nonEmpty)
    // every window has a winner, so consecutive selected positions
    // can be at most w apart
    assert(ps.zip(ps.tail).forall { case (a, b) => b - a <= 4 })
  }

  test("winnowFingerprints: deterministic across repartitionings") {
    val docs = (0L until 20L).map(i => (i, s"prefix${i}sometext${i * 7}suffix"))
      .toDF("doc_id", "text")
    val a = Dedup.winnowFingerprints(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = Dedup.winnowFingerprints(docs.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("winnowOverlap: a quoted passage pairs the two docs; containment is exact") {
    // docs 1 and 2 share a long distinctive run; doc 3 is disjoint
    val quote = "THEQUICKBROWNFOXJUMPSOVER13LAZYDOGS"
    val docs = Seq(
      (1L, s"aaaa$quote aaaa"),
      (2L, s"bbbbbbbb$quote bbbbbbbb"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowOverlap(docs, "doc_id", "text",
      k = 5, w = 4, maxDf = 20L, minShared = 1L).collect()
    val pair = out.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.length == 1, s"expected exactly the (1,2) pair, got ${out.mkString(",")}")
    val shared = pair.head.getLong(2)
    assert(shared >= 3, "a 35-char shared run selects several fingerprints")
    // recompute containment from the fingerprint table
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val n1 = fps.filter(_._1 == 1L).map(_._2).toSet.size
    val n2 = fps.filter(_._1 == 2L).map(_._2).toSet.size
    val expect = BigDecimal(shared.toDouble / math.min(n1, n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(pair.head.getDouble(3) - expect) < 1e-9)
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("winnowOverlap: the df cap excludes boilerplate fingerprints from pairing") {
    // the same license header in every doc; unique bodies. With
    // maxDf = 2 the header fingerprints (df = 4) cannot pair anything.
    val header = "COPYRIGHTNOTICEALLRIGHTSRESERVED2026"
    val docs = (1L to 4L).map(i =>
      (i, s"$header body${i * 7919}x${i * i * 1009}y${i * 31 + 7}z"))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowOverlap(docs, "doc_id", "text",
      k = 5, w = 4, maxDf = 2L, minShared = 1L).collect()
    assert(capped.isEmpty, s"df-capped: ${capped.mkString(",")}")
    val uncapped = Dedup.winnowOverlap(docs, "doc_id", "text",
      k = 5, w = 4, maxDf = 100L, minShared = 1L).collect()
    assert(uncapped.length == 6, "without the cap all 6 header pairs appear")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("editDistancePairs: equals the brute-force join on an edit-heavy corpus") {
    // 12 base strings, each with a substitution, a deletion + append,
    // and an unrelated sibling — dense enough that prefix filtering
    // must prove its recall against brute force
    val base = (0 until 12).map(i => s"the rain in spain falls mainly ${i * 7919} on the plain")
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 10L, t),
        (i * 10L + 1, t.updated(4, 'X').toString),
        (i * 10L + 2, t.substring(0, 8) + t.substring(9) + "Z"),
        (i * 10L + 3, s"utterly different content number ${i * 104729}"))
    }
    val docs = rows.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 2, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib && math.abs(ta.length - tb.length) <= 2
      d = lev(ta, tb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(brute.size >= 24, "every base pairs with its two variants")
  }

  test("editDistancePairs: exact distances; strings shorter than q drop") {
    val docs = Seq(
      (1L, "abcdefghijkl"), (2L, "abcQefghijkl"), (3L, "abdefghijklZ"),
      (4L, "ab"), (5L, "ba")).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 2, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 1, "one substitution")
    assert(out((1L, 3L)) == 2, "delete + append")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L),
      "len < q strings are dropped (named caveat)")
  }

  test("editDistancePairs: deterministic across repartitionings") {
    val docs = (0L until 30L).map(i =>
      (i, s"record number ${i / 3} payload ${i % 3} tail")).toDF("doc_id", "text")
    val a = Dedup.editDistancePairs(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = Dedup.editDistancePairs(docs.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("winnowOverlap: deterministic across repartitionings") {
    val docs = (0L until 24L).map(i =>
      (i, s"sharedcorpusprefix${i % 3}midsection${i * 7919}tail"))
      .toDF("doc_id", "text")
    val a = Dedup.winnowOverlap(docs.repartition(7), "doc_id", "text",
      maxDf = 30L, minShared = 1L).collect().map(_.toSeq).toSet
    val b = Dedup.winnowOverlap(docs.coalesce(1), "doc_id", "text",
      maxDf = 30L, minShared = 1L).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("cdcChunks: partition invariant, boundaries self-synchronize") {
    // the SAME long tail behind two very different prefixes: chunk
    // concatenation must reconstruct each text exactly (boundaries
    // partition the string), and the trailing chunks must COINCIDE —
    // anchors depend only on the k chars under them, so the shared
    // region re-synchronizes after its first anchor. mod=16 keeps
    // expected chunk length 16 so the ~300-char tail holds many.
    val shared = (1 to 12).map(i => s"common segment $i with stable text")
      .mkString(" ")
    val df = Seq((1L, "A " + shared),
      (2L, "a completely different and much longer prefix here " + shared))
      .toDF("id", "text")
    val rows = Dedup.cdcChunks(df, "id", "text", k = 8, mod = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val c1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val c2 = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(c1.mkString == "A " + shared)
    assert(c2.mkString ==
      "a completely different and much longer prefix here " + shared)
    val m = c1.reverse.zip(c2.reverse).takeWhile { case (x, y) => x == y }.size
    assert(m >= 2, s"expected >=2 synchronized trailing chunks, got $m")
    // determinism across partitionings
    val a = Dedup.cdcChunks(df.repartition(5), "id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == Dedup.cdcChunks(df.coalesce(1), "id", "text")
      .collect().map(_.toSeq).toSet)
  }

  test("ChunkExpressions kernels: codepoint boundaries and occurrence ordinals") {
    import org.apache.spark.sql.functions.col
    // CDC kernel cuts on CODEPOINT boundaries: a supplementary char
    // (U+1F600, two java chars) must never split, and the chunks must
    // reassemble the text exactly
    val uni = "héllo 😀 wörld — " + ("abcdefgh " * 20)
    val chunks = Seq((1L, uni)).toDF("id", "text")
    val got = Dedup.cdcChunks(chunks, "id", "text", k = 8, mod = 8)
      .collect().sortBy(_.getInt(1)).map(_.getString(2))
    assert(got.mkString == uni, "chunks must partition the text")
    // Ed-Join keying kernel: the i-th copy of gram g becomes g#i, in
    // position order — the hand case "abab" has ab twice
    val keys = Seq(Tuple1("abab")).toDF("t")
      .select(graft.plans.ChunkExpressions.positional_qgram_keys(col("t"), 2))
      .collect().head.getSeq[String](0)
    assert(keys == Seq("ab#1", "ba#1", "ab#2"))
    // too short for any gram: empty, never null
    val short = Seq(Tuple1("a")).toDF("t")
      .select(graft.plans.ChunkExpressions.positional_qgram_keys(col("t"), 2))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty)
  }
}
