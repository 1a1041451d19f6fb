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
}
