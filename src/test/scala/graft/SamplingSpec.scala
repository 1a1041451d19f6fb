package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("globalShuffle: ranks equal the naive global-window formulation") {
    val df = (1L to 257L).toDF("k")
    val got = Sampling.globalShuffle(df, col("k"), numPartitions = 7)
      .select("k", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("shuffle_pos",
        row_number().over(Window.orderBy(
          md5(concat(lit("shuf_"), col("k").cast("string"))),
          col("k").cast("string"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalShuffle: permutation is a bijection onto [1, N], even with empty partitions") {
    val df = (1L to 10L).toDF("k")
    val pos = Sampling.globalShuffle(df, col("k"), numPartitions = 32)
      .select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to 10L))
  }

  test("globalShuffle: stable across repartitionings of the input") {
    val df = (1L to 100L).toDF("k")
    val a = Sampling.globalShuffle(df.repartition(13), col("k"))
      .select("k", "shuffle_pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.globalShuffle(df.coalesce(1), col("k"))
      .select("k", "shuffle_pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("groupedPositions: equals the per-group row_number window formulation") {
    // 3 groups of very different sizes over a key order that interleaves
    // the groups — the six-rung length-bucket regime in miniature
    val df = (1L to 300L).map(k => (k, (k % 7 min 2).toString)).toDF("k", "g")
    val got = Sampling.groupedPositions(df, Seq("g"), Seq(col("k")), "rn",
        numPartitions = 5)
      .select("g", "k", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("k")).cast("long"))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("groupedPositions: positions are a bijection onto [1, |group|] per group") {
    val df = (1L to 100L).map(k => (k, (k % 3).toString)).toDF("k", "g")
    val out = Sampling.groupedPositions(df, Seq("g"), Seq(col("k")), "rn",
        numPartitions = 16)
      .select("g", "rn").collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    out.foreach { case (g, pos) =>
      assert(pos == (1L to pos.size), s"group $g positions not 1..n: $pos")
    }
  }

  test("rankedPrefixSums: equals the stacked rank+cumsum window formulation") {
    // a count-table shape with tied values (ties broken by id) —
    // descending value expressed as the negated sort column
    val df = (1L to 200L).map(k => (k, (k * 37 % 11) + 1)).toDF("id", "n")
    val got = Sampling.rankedPrefixSums(df,
        Seq(col("n") * -1L, col("id")), col("n"), "rank", "cum",
        numPartitions = 7)
      .select("id", "rank", "cum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = Window.orderBy(desc("n"), asc("id"))
    val want = df.select(col("id"),
        row_number().over(w).cast("long").as("rank"),
        sum("n").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // stable across input partitionings (the globalShuffle contract)
    val again = Sampling.rankedPrefixSums(df.repartition(13),
        Seq(col("n") * -1L, col("id")), col("n"), "rank", "cum",
        numPartitions = 3)
      .select("id", "rank", "cum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == want)
  }

  test("coverageSelect: greedy max-coverage with id ties, early stop when covered") {
    // trigram sets: 1 -> {a_b_c, b_c_d}; 2 -> {a_b_c, b_c_d, c_d_e};
    // 3 -> {x_y_z, y_z_w}; 4 -> {p_q_r}; 5 duplicates 3 (higher id)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "x y z w"),
      (4L, "p q r"), (5L, "x y z w")
    ).toDF("doc_id", "text")
    val out = Sampling.coverageSelect(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // round 1: doc 2 covers 3 grams; round 2: docs 3 and 5 both add 2,
    // id breaks to 3; round 3: doc 4 adds 1; then EVERY gram is
    // covered (doc 1's set ⊂ doc 2's, doc 5's == doc 3's) -> early
    // stop at 3 rows despite k = 5
    assert(out == Seq((1, 2L, 3L), (2, 3L, 2L), (3, 4L, 1L)))
  }

  test("mixtureWeights: shares sum to 1, uniform target weight is total/(G*n)") {
    // groups of 1, 3 and 4 units → total 8, G = 3
    val df = Seq(("a", 1L), ("b", 3L), ("c", 4L)).toDF("g", "units")
    val out = Sampling.mixtureWeights(df, "g", col("units"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("a") == (1L, 1.0 / 8.0, 8.0 / 3.0))
    assert(out("b") == (3L, 3.0 / 8.0, 8.0 / 9.0))
    assert(out("c") == (4L, 4.0 / 8.0, 8.0 / 12.0))
    assert(out.values.map(_._2).sum == 1.0)
  }

  test("weightedSample: exactly perGroup rows per group, heavier keys favored") {
    // 200 keys per group; weight = 1 for even keys, 1000 for odd keys —
    // the odd keys' priorities are 1000× smaller, so (with overwhelming
    // margin at this ratio) every winner is odd
    val df = (1L to 400L).map(k => (if (k <= 200) "a" else "b", k,
      if (k % 2 == 1) 1000L else 1L)).toDF("g", "k", "w")
    val out = Sampling.weightedSample(df, "g", col("k"), col("w"), perGroup = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "a") == 10 && out.count(_._1 == "b") == 10)
    assert(out.forall(_._2 % 2 == 1), "all winners should carry weight 1000")
  }

  test("weightedSample: deterministic across repartitionings") {
    val df = (1L to 300L).map(k => ("g", k, k)).toDF("g", "k", "w")
    val a = Sampling.weightedSample(df.repartition(11), "g", col("k"), col("w"), 20)
      .collect().map(_.getLong(1)).toSet
    val b = Sampling.weightedSample(df.coalesce(1), "g", col("k"), col("w"), 20)
      .collect().map(_.getLong(1)).toSet
    assert(a == b && a.size == 20)
  }

  test("mixtureResample: integer weights repeat exactly, zero weight drops") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L)).toDF("g", "k")
    val w = Seq(("a", 2.0), ("b", 1.0), ("c", 0.0)).toDF("g", "weight")
    val out = Sampling.mixtureResample(df, "g", col("k"), w)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // integer weights have frac 0 → the stochastic extra copy never fires
    assert(out.count(_._1 == 1L) == 2 && out.count(_._1 == 2L) == 2)
    assert(out.count(_._1 == 3L) == 1)
    assert(!out.exists(_._1 == 4L), "weight-0 group must vanish")
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L))
  }

  test("mixtureResample: fractional weight emits floor or ceil copies, expectation ≈ w") {
    val df = (1L to 1000L).map(k => ("g", k)).toDF("g", "k")
    val w = Seq(("g", 1.5)).toDF("g", "weight")
    val counts = Sampling.mixtureResample(df, "g", col("k"), w)
      .groupBy("k").count().collect().map(_.getLong(1))
    assert(counts.forall(c => c == 1 || c == 2))
    // hash32/2³² is uniform: the extra-copy share concentrates near 0.5
    val extra = counts.count(_ == 2).toDouble / 1000
    assert(extra > 0.4 && extra < 0.6, s"extra-copy share $extra far from 0.5")
    // cap: weight 100 clamps to maxRepeat
    val capped = Sampling.mixtureResample(df.limit(5), "g", col("k"),
      Seq(("g", 100.0)).toDF("g", "weight"), maxRepeat = 3)
      .groupBy("k").count().collect().map(_.getLong(1))
    assert(capped.forall(_ == 3))
  }

  test("weightedTopK: same selected set as weightedSample over one constant group") {
    val df = (1L to 300L).map(k => ("all", k, k)).toDF("g", "k", "w")
    val win = Sampling.weightedSample(df, "g", col("k"), col("w"), 25)
      .collect().map(_.getLong(1)).toSet
    val topk = Sampling.weightedTopK(df, col("k"), col("w"), 25)
      .collect().map(_.getLong(1)).toSet
    assert(topk == win && topk.size == 25)
    // the provably-positive fast path selects the identical set
    val fast = Sampling.weightedTopK(df, col("k"), col("w"), 25,
      weightProvablyPositive = true)
      .collect().map(_.getLong(1)).toSet
    assert(fast == win)
  }

  test("domainCap: caps hot domains, leaves small ones whole, stable under repartition") {
    val df = ((1L to 100L).map(k => ("hot", k)) ++ Seq(("cold", 200L), ("cold", 201L)))
      .toDF("g", "k")
    val out = Sampling.domainCap(df, "g", col("k"), cap = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "hot") == 10 && out.count(_._1 == "cold") == 2)
    val again = Sampling.domainCap(df.repartition(7), "g", col("k"), cap = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == again.toSet)
  }

  test("domainCapThinned: identical survivors to domainCap on a skewed corpus") {
    // one crawler-trap domain at 5000 rows, two normal ones — the
    // thinned path must select the EXACT same winners the plain window
    // formulation does (prefix thresholding preserves md5 order)
    val df = ((1L to 5000L).map(k => ("trap", k)) ++
      (6000L to 6030L).map(k => ("a", k)) ++ Seq(("b", 7000L)))
      .toDF("g", "k")
    val plain = Sampling.domainCap(df, "g", col("k"), cap = 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val thinned = Sampling.domainCapThinned(df, "g", col("k"), cap = 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(thinned == plain)
    assert(plain.count(_._1 == "trap") == 12 &&
      plain.count(_._1 == "a") == 12 && plain.count(_._1 == "b") == 1)
  }

  test("tokenBudget: running total fills the budget, straddler kept") {
    // one group, every doc 10 tokens, budget 35 -> the kept docs are
    // exactly the first 4 in tb_-salted hash order (30 before the 4th
    // is < 35, 40 before the 5th is not)
    val df = (1L to 50L).map(k => ("g", k, 10L)).toDF("g", "k", "toks")
    val kept = Sampling.tokenBudget(df, "g", col("k"), col("toks"), budget = 35L)
      .collect().map(_.getLong(1)).toSet
    assert(kept.size == 4)
    val order = df.withColumn("h",
        md5(concat(lit("tb_"), col("k").cast("string"))))
      .orderBy(col("h"), col("k").cast("string"))
      .collect().map(_.getLong(1)).take(4).toSet
    assert(kept == order)
    // a group with fewer tokens than the budget survives whole
    val tiny = Sampling.tokenBudget(
      Seq(("t", 1L, 5L), ("t", 2L, 5L)).toDF("g", "k", "toks"),
      "g", col("k"), col("toks"), budget = 100L)
    assert(tiny.count() == 2)
  }

  test("curriculumOrder: positions are a bijection walking phases in order, shuffled within") {
    val df = (1L to 90L).map(k => (k, (k % 3).toInt)).toDF("k", "phase")
    val got = Sampling.curriculumOrder(df, col("phase"), col("k"), numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq == (1L to 90L), "bijection onto [1, N]")
    // phase blocks are contiguous: every phase-0 position < every phase-1 < phase-2
    val byPhase = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byPhase(0).max < byPhase(1).min && byPhase(1).max < byPhase(2).min)
    // within a phase the order is the cur_-salted hash order, not key order
    val phase0 = got.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(phase0.toSeq != phase0.sorted.toSeq, "within-phase order should be shuffled")
    // matches the naive global-window formulation exactly
    val want = df.withColumn("curriculum_pos",
        row_number().over(Window.orderBy(col("phase"),
          md5(concat(lit("cur_"), col("k").cast("string"))),
          col("k").cast("string"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.map(t => t._1 -> t._3).toMap == want)
  }

  test("leakageSafeSplit: a near-dup family never straddles splits") {
    val docs = (1L to 200L).toDF("doc_id")
    // clusters: {1..10} -> canonical 1, {11..14} -> canonical 11
    val clusters = ((1L to 10L).map(i => (i, 1L)) ++
      (11L to 14L).map(i => (i, 11L))).toDF("doc_id", "canonical_id")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters, 0.1, 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 200)
    // every cluster member shares its canonical's split
    assert((1L to 10L).map(out(_)._2).toSet.size == 1)
    assert((11L to 14L).map(out(_)._2).toSet.size == 1)
    // cluster members key by the canonical, singletons by themselves
    assert((1L to 10L).forall(out(_)._1 == 1L))
    assert(out(50L)._1 == 50L)
    // all three splits are populated at n=200 and the ratio is sane
    val bySplit = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 100)
  }

  test("leakageSafeSplit: rejects fractions that leave no train share") {
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit((1L to 3L).toDF("doc_id"), "doc_id",
        Seq.empty[(Long, Long)].toDF("doc_id", "canonical_id"), 0.6, 0.5)
    }
  }
  test("quantileNormalize: mismatched group scales land on one distribution") {
    // group a scores 1..4, group b scores 10x — after calibration both
    // groups carry the SAME global quantile values: g = (rn-1)*8 div 4
    // + 1 = {1,3,5,7} -> global scores {1.0, 3.0, 10.0, 30.0}
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "b", 10.0), (6L, "b", 20.0), (7L, "b", 30.0), (8L, "b", 40.0))
      .toDF("doc_id", "source", "score")
    val out = Sampling.quantileNormalize(df, "source", "score", "doc_id")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    val exp = Seq(1.0, 3.0, 10.0, 30.0)
    assert(out.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq == exp)
    assert(out.filter(_._1 == "b").sortBy(_._2).map(_._3).toSeq == exp)
  }

  test("strictLongId: numeric strings pass, non-numeric ids fail LOUDLY") {
    // a plain cast("long") silently nulls 'doc-17' — downstream that is
    // an NPE at getLong, or a bogus path root in threadPaths
    val ok = Seq("1", "42").toDF("id")
      .select(Sampling.strictLongId(col("id"), "spec").as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(ok == Set(1L, 42L))
    val bad = Seq("1", "doc-17").toDF("id")
      .select(Sampling.strictLongId(col("id"), "spec").as("id"))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("doc-17")), "error names the bad value")
    // NULL ids stay NULL (threadPaths roots) rather than erroring
    val withNull = Seq(Some("7"), None).toDF("id")
      .select(Sampling.strictLongId(col("id"), "spec").as("id")).collect()
    assert(withNull.count(_.isNullAt(0)) == 1)
  }

  test("quantileNormalize: a single group calibrates to itself") {
    val df = (1L to 9L).map(i => (i, "only", (i * 37 % 10).toDouble))
      .toDF("doc_id", "source", "score")
    val out = Sampling.quantileNormalize(df, "source", "score", "doc_id")
      .collect()
    assert(out.length == 9)
    assert(out.forall(r => r.getDouble(2) == r.getDouble(3)),
      "with one group, rank and global rank coincide")
  }

  test("doremiReweight: hard domain upweights, weights renormalize to 1") {
    // A: excess 1.0 -> raw = round(e^0.5, 9) = 1.648721271; B: loss
    // below ref -> excess clamps to 0, raw stays 1.0. Z = 2.648721271.
    val dom = Seq(("A", 3.0, 2.0, 1.0), ("B", 2.0, 2.5, 1.0))
      .toDF("source", "loss", "ref_loss", "w")
    val out = Sampling.doremiReweight(dom, "source", "loss", "ref_loss",
        "w", eta = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(out("A") == ((1.0, 0.622459)))
    assert(out("B") == ((0.0, 0.377541)))
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
    // equal losses -> uniform weights regardless of eta
    val eq = Sampling.doremiReweight(
      Seq(("A", 2.0, 2.0, 1.0), ("B", 2.0, 2.0, 1.0), ("C", 2.0, 2.0, 1.0))
        .toDF("source", "loss", "ref_loss", "w"),
      "source", "loss", "ref_loss", "w", eta = 2.0)
      .collect().map(_.getDouble(2))
    assert(eq.forall(_ == 0.333333))
  }

  test("unimaxBudget: hand-computed waterfill — capped, uncapped, and " +
      "budget-exceeds-capacity") {
    def run(rows: Seq[(String, Long)], e: Long, num: Long, den: Long) =
      Sampling.unimaxBudget(rows.toDF("g", "u"), "g", col("u"),
          budgetNum = num, budgetDen = den, maxEpochs = e)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getBoolean(3), r.getDouble(4), r.getDouble(5))))
        .toMap
    // units 10/20/70, E=1, B = 100*4/5 = 80: a and b capped at their
    // full capacity, c truncated to the 50-token remainder
    val r = run(Seq(("a", 10L), ("b", 20L), ("c", 70L)), 1L, 4L, 5L)
    assert(r("a") == ((10L, true, 10.0, 1.0)))
    assert(r("b") == ((20L, true, 20.0, 1.0)))
    assert(r("c") == ((70L, false, 50.0, 0.714286)))
    // budget past total capacity: everyone capped at maxEpochs
    val all = run(Seq(("a", 10L), ("b", 10L)), 2L, 5L, 1L)
    assert(all("a") == ((20L, true, 20.0, 2.0)))
    assert(all("b") == ((20L, true, 20.0, 2.0)))
    // tiny budget: nobody capped, equal shares
    val none = run(Seq(("a", 10L), ("b", 30L)), 1L, 1L, 4L)
    assert(none("a") == ((10L, false, 5.0, 0.5)))
    assert(none("b") == ((30L, false, 5.0, 0.166667)))
  }

  test("neymanAllocation: allocation tracks N_h*sigma_h; constant " +
      "strata get zero; all-constant reports NULL") {
    // A={1,3}: sigma 1, w 2; B={1,5}: sigma 2, w 4; C={7,7}: w 0
    val d = Seq(("A", 1L), ("A", 3L), ("B", 1L), ("B", 5L),
      ("C", 7L), ("C", 7L)).toDF("g", "v")
    val r = Sampling.neymanAllocation(d, "g", "v", sampleSize = 6L)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(4)))).toMap
    assert(r("A") == ((2L, 1.0, 2.0)))
    assert(r("B") == ((2L, 2.0, 4.0)))
    assert(r("C") == ((2L, 0.0, 0.0)))
    // every stratum constant: sum of weights 0 -> NULL allocs, loudly
    val flat = Seq(("A", 5L), ("A", 5L)).toDF("g", "v")
    assert(Sampling.neymanAllocation(flat, "g", "v", 10L)
      .collect().head.isNullAt(4))
  }
}
