package graft

import graft.operators.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("bleuRouge: identical pair scores 1.0 everywhere") {
    val pairs = Seq((1L, "the cat sat on the mat", "the cat sat on the mat"))
      .toDF("id", "cand", "ref")
    val r = Eval.bleuRouge(pairs, "id", "cand", "ref").collect().head
    assert(r.getLong(1) == 6 && r.getLong(2) == 6)
    assert((3 to 8).forall(i => r.getDouble(i) == 1.0))
    assert(r.getDouble(9) == 1.0)
  }

  test("cohensKappa: hand-computed 2x2 case; NULLs excluded and counted") {
    // a=(x,x,y,y), b=(x,y,y,y): po=3/4; marginals a:(2,2) b:(1,3)
    // pe=(2*1+2*3)/16=1/2; kappa=(3/4-1/2)/(1/2)=1/2
    val pairs = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"),
      ("x", null)).toDF("a", "b")
    val r = Eval.cohensKappa(pairs, "a", "b").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.5 &&
      r.getDouble(4) == 0.5)
  }

  test("cohensKappa: constant raters pin kappa 0, never NaN") {
    val pairs = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = Eval.cohensKappa(pairs, "a", "b").collect().head
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 0.0)
  }

  test("cohensKappa: all-NULL pairs pin po/pe/kappa to 0, never NaN") {
    val pairs = Seq(("x", null), (null, "y"), (null, null))
      .toDF("a", "b")
    val r = Eval.cohensKappa(pairs, "a", "b").collect().head
    assert(r.getLong(0) == 0 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
      r.getDouble(4) == 0.0)
  }

  test("bootstrapCI: NULL values are excluded outright, not zero-weighted") {
    // 500 rows at 0.25 plus 500 NULLs: a null row must not contribute
    // its Poisson weight to any denominator — the estimate stays the
    // constant, exactly as if the nulls were never there
    val df = (1L to 1000L)
      .map(i => (i, if (i <= 500) Some(0.25) else None))
      .toDF("id", "v")
    val r = Eval.bootstrapCI(df, "id", "v", replicates = 40).collect().head
    assert(r.getDouble(1) == 0.25 && r.getDouble(2) == 0.25 &&
      r.getDouble(3) == 0.25)
  }

  test("bootstrapCI: constant metric collapses the interval onto the point") {
    // every replicate mean of a constant equals the constant, whatever
    // the Poisson weights drew — the interval MUST be degenerate
    val df = (1L to 500L).map(i => (i, 0.25)).toDF("id", "v")
    val r = Eval.bootstrapCI(df, "id", "v", replicates = 40).collect().head
    assert(r.getInt(0) == 40)
    assert(r.getDouble(1) == 0.25 && r.getDouble(2) == 0.25 &&
      r.getDouble(3) == 0.25)
  }

  test("bootstrapCI: interval brackets the point; deterministic") {
    val df = (1L to 1000L).map(i => (i, (i % 97).toDouble / 97.0))
      .toDF("id", "v")
    val a = Eval.bootstrapCI(df, "id", "v").collect().head
    assert(a.getDouble(2) <= a.getDouble(1) && a.getDouble(1) <= a.getDouble(3),
      s"ci_lo <= point <= ci_hi: $a")
    assert(a.getDouble(3) - a.getDouble(2) < 0.05, "tight at n=1000")
    val b = Eval.bootstrapCI(df.repartition(7), "id", "v").collect().head
    assert(a == b, "repartitioning cannot move a single replicate mean")
  }

  test("chrF: identical pair scores 1.0; whitespace is invisible") {
    val pairs = Seq((1L, "the cat", "the cat"), (2L, "th e cat", "thecat"))
      .toDF("id", "cand", "ref")
    val rs = Eval.chrF(pairs, "id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).getDouble(3) == 1.0 && rs(1L).getDouble(4) == 1.0 &&
      rs(1L).getDouble(5) == 1.0)
    // 'th e cat' and 'thecat' are the SAME char stream after stripping
    assert(rs(2L).getDouble(5) == 1.0)
    assert(rs(2L).getLong(1) == 6 && rs(2L).getLong(2) == 6)
  }

  test("chrF: hand-computed 'ab' vs 'abc' (orders beyond the text score 0)") {
    // cand grams: a,b | ab; ref: a,b,c | ab,bc | abc
    // p = (1 + 1 + 0·4)/6 = 1/3; r = (2/3 + 1/2 + 0·4)/6 = 7/36
    // chrF2 = 5PR/(4P+R) = (35/108)/(55/36) = 7/33
    val pairs = Seq((1L, "ab", "abc")).toDF("id", "cand", "ref")
    val r = Eval.chrF(pairs, "id", "cand", "ref").collect().head
    assert(math.abs(r.getDouble(3) - 1.0 / 3) < 1e-6, "chrP")
    assert(math.abs(r.getDouble(4) - 7.0 / 36) < 1e-6, "chrR")
    assert(math.abs(r.getDouble(5) - 7.0 / 33) < 1e-6, "chrF2")
  }

  test("chrF: empty/NULL candidate scores explicit zeros, row kept") {
    val pairs = Seq((1L, "", "abc"), (2L, null, "abc"), (3L, "xyz", "abc"))
      .toDF("id", "cand", "ref")
    val rs = Eval.chrF(pairs, "id", "cand", "ref").collect()
    assert(rs.length == 3)
    val byId = rs.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 0 && byId(1L).getDouble(5) == 0.0)
    assert(byId(2L).getDouble(5) == 0.0)
    assert(byId(3L).getDouble(5) == 0.0, "disjoint chars score 0")
  }

  test("bleuRouge: clipping stops the 'the the the' degenerate candidate") {
    // BLEU paper example: p1 = min(7, 2) / 7 = 2/7; no shared bigrams
    val pairs = Seq((1L, "the the the the the the the",
      "the cat is on the mat")).toDF("id", "cand", "ref")
    val r = Eval.bleuRouge(pairs, "id", "cand", "ref").collect().head
    assert(math.abs(r.getDouble(3) - 2.0 / 7.0) < 1e-6, "p1 clipped")
    assert(r.getDouble(4) == 0.0, "p2: no shared bigram")
    assert(r.getDouble(9) == 0.0, "any zero precision zeroes bleu")
  }

  test("bleuRouge: brevity penalty on a perfect but truncated candidate") {
    // cand = first 4 of 6 ref words: p1..p4 = 1, BP = exp(1 - 6/4)
    val pairs = Seq((1L, "alpha beta gamma delta",
      "alpha beta gamma delta epsilon zeta")).toDF("id", "cand", "ref")
    val r = Eval.bleuRouge(pairs, "id", "cand", "ref").collect().head
    assert((3 to 6).forall(i => r.getDouble(i) == 1.0))
    val expect = BigDecimal(math.exp(1.0 - 6.0 / 4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(9) - expect) < 1e-9)
    // rouge1 recall = 4/6
    assert(math.abs(r.getDouble(7) - 0.666667) < 1e-6)
  }

  test("bleuRouge: short texts keep supported n only; deterministic") {
    val pairs = (0L until 30L).map(i =>
      (i, s"tok${i % 5} tok${i % 3}", s"tok${i % 5} tok${i % 3} tok${i % 7}"))
    val a = Eval.bleuRouge(pairs.toDF("id", "cand", "ref").repartition(7),
      "id", "cand", "ref").collect().map(_.toSeq).toSet
    val b = Eval.bleuRouge(pairs.toDF("id", "cand", "ref").coalesce(1),
      "id", "cand", "ref").collect().map(_.toSeq).toSet
    assert(a == b && a.size == 30)
    // a 2-token candidate has no 3-grams: p3 = p4 = 0, bleu = 0
    assert(a.forall(r => r(5) == 0.0 && r(9) == 0.0))
  }

  test("bleuRouge: empty and NULL texts score explicit zeros, never [\"\"] grams") {
    // split(' ') maps ''/NULL to [""] — before the filter, an empty
    // candidate counted ONE empty-string unigram (len_cand=1) that
    // could clip-match; NULL texts dropped the pair entirely. Both
    // degenerate shapes must now yield an all-zeros row.
    val pairs = Seq(
      (1L, "", "alpha beta"),             // empty candidate
      (2L, "alpha beta", ""),             // empty reference
      (3L, "", ""),                       // both empty
      (4L, null.asInstanceOf[String], "alpha"), // NULL candidate
      (5L, "alpha", null.asInstanceOf[String])) // NULL reference
      .toDF("id", "cand", "ref")
    val rows = Eval.bleuRouge(pairs, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 5, "every pair keeps a row, including both-empty")
    for ((id, r) <- rows) {
      assert(r.getDouble(9) == 0.0, s"bleu($id)")
      assert(r.getDouble(7) == 0.0 && r.getDouble(8) == 0.0, s"rouge($id)")
    }
    assert(rows(1L).getLong(1) == 0 && rows(1L).getLong(2) == 2,
      "empty cand: len_cand 0, not the [\"\"] artifact's 1")
    assert(rows(3L).getLong(1) == 0 && rows(3L).getLong(2) == 0)
  }

  test("retrievalMetrics: hand-computed MRR, precision, recall, nDCG") {
    val runs = Seq((1L, 30L, 1), (1L, 10L, 2), (1L, 20L, 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 2L), (1L, 20L, 1L)).toDF("query_id", "doc_id", "rel")
    val r = Eval.retrievalMetrics(runs, qrels, "query_id", "doc_id",
      "rank", "rel", k = 3).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.5, "first relevant at rank 2")
    assert(math.abs(r.getDouble(4) - 0.666667) < 1e-9, "precision@3")
    assert(r.getDouble(5) == 1.0, "recall@3")
    def t(g: Double, pos: Double) = BigDecimal(
      (math.pow(2.0, g) - 1.0) / (math.log(pos + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = t(2, 2) + t(1, 3)
    val idcg = t(2, 1) + t(1, 2)
    val expect = BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(6) - expect) < 1e-9, s"ndcg: ${r.getDouble(6)} vs $expect")
  }

  test("retrievalMetrics: no-relevant queries and qrels-only queries report zeros") {
    val runs = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((2L, 10L, 1L)).toDF("query_id", "doc_id", "rel")
    val out = Eval.retrievalMetrics(runs, qrels, "query_id", "doc_id",
      "rank", "rel", k = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 0 && out(1L).getDouble(3) == 0.0 &&
      out(1L).getDouble(6) == 0.0, "ran but nothing relevant")
    assert(out(2L).getLong(1) == 1 && out(2L).getLong(2) == 0 &&
      out(2L).getDouble(6) == 0.0, "relevant but never retrieved")
  }

  test("rocAuc: hand-computed with a tie, perfect and reversed groups, NULL path") {
    // g=1: pos {0.9, 0.5}, neg {0.5, 0.1} -> 3 concordant + 1 tie of 4
    // pairs = 0.875; g=2 perfectly separated; g=3 perfectly reversed;
    // g=4 has no negatives -> NULL auc
    val df = Seq(
      (1, 0.9, 1), (1, 0.5, 1), (1, 0.5, 0), (1, 0.1, 0),
      (2, 0.8, 1), (2, 0.7, 1), (2, 0.3, 0),
      (3, 0.2, 1), (3, 0.9, 0),
      (4, 0.6, 1), (4, 0.4, 1)).toDF("grp", "score", "label")
    val out = Eval.rocAuc(df, "grp", "score", "label").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(1).getDouble(3) == 0.875)
    assert(out(2).getDouble(3) == 1.0)
    assert(out(3).getDouble(3) == 0.0)
    assert(out(4).isNullAt(3) && out(4).getLong(1) == 2 && out(4).getLong(2) == 0)
  }

  test("rocAuc: bucket count is an implementation detail - results identical") {
    val df = (for (i <- 1L to 400L) yield (
      i % 3, ((i * 37) % 97).toDouble / 97.0,
      if ((i * 37) % 97 + i % 31 >= 80) 1 else 0)).toDF("grp", "score", "label")
    val a = Eval.rocAuc(df.repartition(7), "grp", "score", "label", buckets = 1000)
      .collect().map(_.toSeq).toSet
    val b = Eval.rocAuc(df.coalesce(1), "grp", "score", "label", buckets = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // sanity: noisy-but-correlated labels land strictly between the
    // degenerate endpoints
    assert(a.forall { s => val v = s(3).asInstanceOf[Double]; v > 0.5 && v < 1.0 })
  }

  test("calibration: hand-computed bins, ECE and Brier") {
    // bin 5 (0.4, 0.5]: scores .45/.45/.5, labels 1/0/0 -> avg_conf
    // 0.466667, acc 1/3; bin 10: scores .95/.85(->bin 9? no: .85 is bin
    // 9) - keep to two occupied bins for the hand computation
    val df = Seq((0.45, 1), (0.45, 0), (0.50, 0), (0.95, 1), (0.95, 1))
      .toDF("score", "label")
    val out = Eval.calibration(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(5L, 10L))
    val b5 = out(5L)
    assert(b5.getLong(1) == 3 && b5.getLong(2) == 1)
    assert(b5.getDouble(3) == 0.466667) // (0.45+0.45+0.5)/3
    assert(b5.getDouble(4) == 0.333333)
    assert(b5.getDouble(5) == 0.133333)
    val b10 = out(10L)
    assert(b10.getDouble(3) == 0.95 && b10.getDouble(4) == 1.0)
    assert(b10.getDouble(5) == 0.05)
    // ece = (3*0.1333... + 2*0.05)/5 = 0.1 ; brier = (0.3025 + 0.2025
    // + 0.25 + 2*0.0025)/5 = 0.152
    assert(b5.getDouble(6) == 0.1 && b10.getDouble(6) == 0.1)
    assert(b5.getDouble(7) == 0.152)
  }

  test("calibration: perfectly calibrated data has zero gaps; bin edges") {
    // score 0.0 lands in bin 1 (not bin 0); score 1.0 in bin 10
    val df = Seq((0.0, 0), (0.0, 0), (1.0, 1), (1.0, 1))
      .toDF("score", "label")
    val out = Eval.calibration(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 10L))
    assert(out(1L).getDouble(5) == 0.0 && out(10L).getDouble(5) == 0.0)
    assert(out(1L).getDouble(6) == 0.0 && out(1L).getDouble(7) == 0.0)
  }

  test("qaTokenF1: normalization, clipping, exact match, empty paths") {
    val df = Seq(
      // normalizes to the same tokens: em=1, f1=1
      (1L, "The Eiffel Tower!", "eiffel   tower"),
      // partial overlap: pred {new york city}, gold {york city centre}
      // -> overlap 2, p=2/3, r=2/3, f1=2/3
      (2L, "New York City", "york city centre"),
      // clipping: pred {cat cat cat}, gold {cat} -> overlap 1, p=1/3,
      // r=1, f1=2/(3+1)=0.5
      (3L, "cat cat cat", "cat"),
      // empty pred vs non-empty gold
      (4L, "", "some answer"),
      // both empty after normalization (articles only)
      (5L, "the a", "an")).toDF("id", "pred", "gold")
    val out = Eval.qaTokenF1(df, "id", "pred", "gold").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getDouble(7) == 1.0)
    assert(out(2L).getInt(1) == 0 && out(2L).getLong(4) == 2)
    assert(out(2L).getDouble(5) == 0.666667 && out(2L).getDouble(7) == 0.666667)
    assert(out(3L).getLong(4) == 1 && out(3L).getDouble(5) == 0.333333 &&
      out(3L).getDouble(6) == 1.0 && out(3L).getDouble(7) == 0.5)
    assert(out(4L).getLong(2) == 0 && out(4L).getDouble(7) == 0.0 &&
      out(4L).getInt(1) == 0)
    assert(out(5L).getLong(2) == 0 && out(5L).getLong(3) == 0 &&
      out(5L).getInt(1) == 1 && out(5L).getDouble(7) == 1.0)
  }

  test("averagePrecision: hand-checked step rule, tie-block END, NULL path") {
    // group A, distinct scores: (0.9, pos) (0.5 tie-block: pos+neg)
    // (0.1, neg): blocks desc -> terms (1/2)(1/1) + (1/2)(2/3) + 0
    // = 0.5 + 0.333333333 = 0.833333
    val a = Seq(("A", 0.9, 1), ("A", 0.5, 1), ("A", 0.5, 0), ("A", 0.1, 0))
    // group B: no positives -> NULL
    val b = Seq(("B", 0.7, 0), ("B", 0.2, 0))
    // group C: perfect ranking -> AP = 1
    val c = Seq(("C", 0.8, 1), ("C", 0.6, 1), ("C", 0.3, 0))
    val out = Eval.averagePrecision((a ++ b ++ c).toDF("g", "score", "lbl"),
      "g", "score", "lbl").collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(3) == 0.833333)
    assert(out("B").isNullAt(3))
    assert(out("C").getDouble(3) == 1.0)
    assert(out("A").getLong(1) == 2 && out("A").getLong(2) == 4)
  }

  test("passAtK: hand-checked estimator, short-circuits, undefined -> NULL") {
    // task 1: n=5, c=2 -> pass@2 = 1 - C(3,2)/C(5,2) = 1 - 3/10 = 0.7
    // task 2: n=4, c=3 -> n-c=1 < 2 -> exactly 1.0 (no float path)
    // task 3: n=3, c=0 -> 1 - C(3,2)/C(3,2) = 0
    // task 4: n=1 < k -> NULL (undefined, loud)
    val samp = (Seq.fill(2)((1L, true)) ++ Seq.fill(3)((1L, false)) ++
      Seq.fill(3)((2L, true)) ++ Seq((2L, false)) ++
      Seq.fill(3)((3L, false)) ++ Seq((4L, true)))
      .toDF("task_id", "ok")
    val out = Eval.passAtK(samp, "task_id", "ok", k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) == 0.7)
    assert(out(2L).getDouble(3) == 1.0)
    assert(out(3L).getDouble(3) == 0.0)
    assert(out(4L).isNullAt(3))
  }

  test("krippendorffAlpha: ragged units, hand-computed 0.5; degenerate De=0") {
    // u1 [a,a] agree, u2 [a,b] disagree, u3 [b,b,b] agree, u4 [a]
    // (single rating -> dropped+reported). n=7; Do = 2/7;
    // De = (3*4 + 4*3)/42 = 4/7; alpha = 1 - 0.5 = 0.5.
    val r = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
      (3L, "b"), (3L, "b"), (4L, "a")).toDF("u", "c")
    val out = Eval.krippendorffAlpha(r, "u", "c").collect().head
    assert(out.getLong(0) == 3 && out.getLong(1) == 1 && out.getLong(2) == 7)
    assert(out.getLong(3) == 2)
    assert(out.getDouble(4) == 0.285714 && out.getDouble(5) == 0.571429)
    assert(out.getDouble(6) == 0.5)
    // every rating one category: De = 0 -> alpha pinned 0.0
    val d = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")).toDF("u", "c")
    assert(Eval.krippendorffAlpha(d, "u", "c").collect().head.getDouble(6)
      == 0.0)
  }

  test("fleissKappa: hand-computed chance-level, perfect, degenerate") {
    // 3 items x 3 raters, 2 categories: s_agree = 6+2+2 = 10,
    // pbar = 10/18; column totals 6 and 3 -> pe = 45/81 = 10/18 too:
    // agreement exactly at chance level -> kappa = 0
    val chance = Seq((1L, 0L), (1L, 0L), (1L, 0L), (2L, 0L), (2L, 0L),
      (2L, 1L), (3L, 0L), (3L, 1L), (3L, 1L)).toDF("item", "cat")
    val c = Eval.fleissKappa(chance, "item", "cat", 3).collect().head
    assert(c.getLong(0) == 3 && c.getLong(1) == 0 && c.getLong(2) == 3 &&
      c.getLong(3) == 2)
    assert(c.getDouble(4) == 0.555556 && c.getDouble(5) == 0.555556 &&
      c.getDouble(6) == 0.0)
    // perfect agreement across 2 balanced items -> kappa = 1; the
    // third item has only 2 ratings and must drop AND be reported
    val perfect = Seq((1L, 0L), (1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L),
      (2L, 1L), (9L, 0L), (9L, 1L)).toDF("item", "cat")
    val p = Eval.fleissKappa(perfect, "item", "cat", 3).collect().head
    assert(p.getLong(0) == 2 && p.getLong(1) == 1)
    assert(p.getDouble(4) == 1.0 && p.getDouble(5) == 0.5 &&
      p.getDouble(6) == 1.0)
    // every rating in ONE category: pe = 1, kappa defined as 0.0
    val degen = Seq((1L, 0L), (1L, 0L), (1L, 0L), (2L, 0L), (2L, 0L),
      (2L, 0L)).toDF("item", "cat")
    val d = Eval.fleissKappa(degen, "item", "cat", 3).collect().head
    assert(d.getDouble(4) == 1.0 && d.getDouble(5) == 1.0 &&
      d.getDouble(6) == 0.0)
  }

  test("retrievalMetrics: deterministic across repartitionings") {
    val runs = (for (q <- 1L to 10L; rk <- 1 to 8)
      yield (q, (q * 31 + rk * 7) % 40, rk)).toDF("query_id", "doc_id", "rank")
    val qrels = (for (q <- 1L to 10L; d <- 0L until 40L if (q + d) % 5 == 0)
      yield (q, d, (d % 3) + 1)).toDF("query_id", "doc_id", "rel")
    val a = Eval.retrievalMetrics(runs.repartition(7), qrels.repartition(5),
      "query_id", "doc_id", "rank", "rel", k = 8)
      .collect().map(_.toSeq).toSet
    val b = Eval.retrievalMetrics(runs.coalesce(1), qrels.coalesce(1),
      "query_id", "doc_id", "rank", "rel", k = 8)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("brierDecomposition: hand-computed Murphy terms; the identity " +
      "brier = rel - res + unc + within holds") {
    // two clean bins: scores 0.2/0.2 labels 0, scores 0.8/0.8 labels 1
    val d = Seq((0.2, 0L), (0.2, 0L), (0.8, 1L), (0.8, 1L))
      .toDF("score", "lbl")
    val r = operators.Eval.brierDecomposition(d, "score", "lbl")
      .collect().head
    assert(r.getLong(0) == 4 && r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.04)   // brier
    assert(r.getDouble(3) == 0.04)   // reliability
    assert(r.getDouble(4) == 0.25)   // resolution
    assert(r.getDouble(5) == 0.25)   // uncertainty
    assert(r.getDouble(6) == 0.0)    // within (constant per bin)
    // within-bin variance: scores 0.11/0.19 (one bin), labels 0 —
    // rel = 0.0225, within = 0.0016, res = unc = 0, brier = 0.0241
    val w = Seq((0.11, 0L), (0.19, 0L)).toDF("score", "lbl")
    val rw = operators.Eval.brierDecomposition(w, "score", "lbl")
      .collect().head
    assert(rw.getDouble(2) == 0.0241 && rw.getDouble(3) == 0.0225)
    assert(rw.getDouble(4) == 0.0 && rw.getDouble(5) == 0.0)
    assert(rw.getDouble(6) == 0.0016)
    // labels CORRELATED with scores inside one bin — the case the
    // covariance-free abbreviation gets wrong: bin 9 holds (0.9, 1)
    // and (0.81, 0). Σs² − n·conf² = 0.00405, Σsy − n·conf·acc =
    // 0.045, within = (0.00405 − 2·0.045)/2 = −0.042975 (a NEGATIVE
    // within is legal — it is a −2·covariance moment, not a
    // variance); rel = (0.855 − 0.5)² = 0.126025, res = 0, unc =
    // 0.25, brier = (0.01 + 0.6561)/2 = 0.33305. Without the
    // covariance term the identity misses by 2·0.045/2 = 0.045.
    val cv = Seq((0.9, 1L), (0.81, 0L)).toDF("score", "lbl")
    val rc = operators.Eval.brierDecomposition(cv, "score", "lbl")
      .collect().head
    assert(rc.getDouble(2) == 0.33305 && rc.getDouble(3) == 0.126025)
    assert(rc.getDouble(4) == 0.0 && rc.getDouble(5) == 0.25)
    assert(rc.getDouble(6) == -0.042975)
    // identity to the birth-rounds on all three cases — including the
    // within-bin-correlated one the old formula failed by 0.045
    for (row <- Seq(r, rw, rc))
      assert(math.abs(row.getDouble(2) - (row.getDouble(3) -
        row.getDouble(4) + row.getDouble(5) + row.getDouble(6))) < 1e-8)
  }
}
