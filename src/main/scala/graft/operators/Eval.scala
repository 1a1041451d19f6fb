package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation-evaluation metrics at corpus scale: BLEU (Papineni et
  * al., ACL 2002) and ROUGE-N recall (Lin, 2004) over
  * (candidate, reference) text pairs — the scoring half of any
  * large-scale eval or distillation-filtering pipeline (keep only
  * teacher outputs whose BLEU/ROUGE against the gold reference clears
  * a bar).
  *
  * Determinism discipline, two tiers:
  *  - modified n-gram precisions p1..p4 and ROUGE-1/2 recalls are
  *    single IEEE divisions of exact integer counts — bit-identical
  *    across engines, rounded to 6 for presentation;
  *  - BLEU itself is transcendental (exp/ln for the geometric mean and
  *    the brevity penalty, neither IEEE-correctly-rounded), so the
  *    composed score is rounded to FOUR decimals — the 5e-5 boundary
  *    spacing makes a cross-engine last-ulp difference collide with a
  *    rounding boundary with probability ~1e-11 per row, versus ~1e-7
  *    at round-6 (the pmi lesson, applied with margin).
  *
  * Scale shape: grams for n = 1..4 explode from each side in one pass
  * (slice + concat_ws over a single split — O(len·n) per doc, the
  * winnowing lesson), counts aggregate per (pair, n, gram), the
  * candidate/reference tables full-outer-join on that key, and
  * everything rolls up per pair — every shuffle is pair-id-keyed;
  * no pair ever sees another pair's data. */
object Eval {

  /** (id, len_cand, len_ref, p1..p4, rouge1, rouge2, bleu) per pair.
    * p_n = clipped-gram matches / candidate grams (modified precision
    * with per-gram clipping, the "the the the" guard); rouge_n =
    * clipped matches / reference grams (recall); bleu =
    * BP · exp(Σ 0.25·ln p_n), 0 if any p_n is 0, BP = exp(1 − r/c)
    * when the candidate is shorter. Pairs whose candidate or reference
    * has fewer than 4 tokens keep rows for the n they support; a
    * missing p_n counts as 0 (and zeroes bleu) — mirrored in SQL. */
  def bleuRouge(pairs: DataFrame, idCol: String, candCol: String,
                refCol: String): DataFrame = {
    def gramTable(textCol: String, side: String): DataFrame = {
      val ws = split(col(textCol), " ")
      pairs.select(col(idCol).as("id"), ws.as("ws"))
        .select(col("id"), explode(expr(
          """transform(sequence(1, 4), n -> struct(n AS n,
            |  CASE WHEN size(ws) >= n THEN
            |    transform(sequence(1, size(ws) - n + 1),
            |      i -> concat_ws(' ', slice(ws, CAST(i AS INT), n)))
            |  ELSE array() END AS gs))""".stripMargin)).as("e"))
        .select(col("id"), col("e.n").as("n"), explode(col("e.gs")).as("g"))
        .groupBy("id", "n", "g").agg(count(lit(1)).as(s"c_$side"))
    }
    val cg = gramTable(candCol, "cand")
    val rg = gramTable(refCol, "ref")
    val perN = cg.join(rg, Seq("id", "n", "g"), "full_outer")
      .groupBy("id", "n")
      .agg(
        sum(least(coalesce(col("c_cand"), lit(0L)),
          coalesce(col("c_ref"), lit(0L)))).as("clip"),
        sum(coalesce(col("c_cand"), lit(0L))).as("tc"),
        sum(coalesce(col("c_ref"), lit(0L))).as("tr"))
    val aggCols =
      Seq(max(when(col("n") === 1, col("tr"))).as("len_ref")) ++
        (1 to 4).flatMap { n =>
          Seq(
            max(when(col("n") === n, col("clip"))).as(s"clip$n"),
            max(when(col("n") === n, col("tc"))).as(s"tc$n"),
            max(when(col("n") === n, col("tr"))).as(s"tr$n"))
        }
    val wide = perN.groupBy("id")
      .agg(max(when(col("n") === 1, col("tc"))).as("len_cand"), aggCols: _*)
    def prec(n: Int) = when(coalesce(col(s"tc$n"), lit(0L)) > 0,
      coalesce(col(s"clip$n"), lit(0L)).cast("double") /
        col(s"tc$n").cast("double")).otherwise(lit(0.0))
    def rec(n: Int) = when(coalesce(col(s"tr$n"), lit(0L)) > 0,
      coalesce(col(s"clip$n"), lit(0L)).cast("double") /
        col(s"tr$n").cast("double")).otherwise(lit(0.0))
    val withP = wide
      .withColumn("pp1", prec(1)).withColumn("pp2", prec(2))
      .withColumn("pp3", prec(3)).withColumn("pp4", prec(4))
    val bp = when(col("len_cand") >= col("len_ref"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("len_ref").cast("double") /
        col("len_cand").cast("double")))
    val bleu = when(
      col("pp1") > 0 && col("pp2") > 0 && col("pp3") > 0 && col("pp4") > 0,
      bp * exp((log(col("pp1")) + log(col("pp2")) + log(col("pp3")) +
        log(col("pp4"))) * lit(0.25)))
      .otherwise(lit(0.0))
    withP.select(col("id").as(idCol),
      col("len_cand"), col("len_ref"),
      round(col("pp1"), 6).as("p1"), round(col("pp2"), 6).as("p2"),
      round(col("pp3"), 6).as("p3"), round(col("pp4"), 6).as("p4"),
      round(rec(1), 6).as("rouge1"), round(rec(2), 6).as("rouge2"),
      round(bleu, 4).as("bleu"))
  }

  /** Retrieval-ranking metrics per query: MRR, nDCG@k, precision@k and
    * recall@k — the other half of the eval family ([[bleuRouge]]
    * scores generation; this scores the retrieval stack the RRF /
    * hard-negative queries build). `runs` carries (query, doc, rank)
    * with rank 1-based and unique per query; `qrels` carries
    * (query, doc, rel) graded relevance (rel ≥ 1 counts as relevant
    * for MRR/precision/recall; DCG uses the standard (2^rel − 1)
    * gain).
    *
    * Determinism: precision/recall/MRR are exact rationals (round-6).
    * DCG terms gain/log2(rank + 1) are transcendental, so each term
    * is rounded to 9 decimals AT BIRTH (the naive-Bayes ln
    * discipline) and summed by an explicit rank-ordered fold —
    * bit-identical across engines; nDCG divides the two folded sums
    * and rounds to 6. The ideal ranking sorts graded rels descending
    * (a deterministic order — gains alone determine IDCG).
    *
    * Scale shape: one left join of runs against qrels on (query, doc)
    * and two query-keyed aggregations (the observed fold over ranks,
    * the ideal fold over sorted gains) — every shuffle query-keyed;
    * queries with no relevant documents report zeros rather than
    * dropping (mirrored in SQL). */
  def retrievalMetrics(runs: DataFrame, qrels: DataFrame,
                       queryCol: String, docCol: String, rankCol: String,
                       relCol: String, k: Int = 10): DataFrame = {
    val joined = runs
      .select(col(queryCol).as("q"), col(docCol).as("d"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .join(qrels.select(col(queryCol).as("q"), col(docCol).as("d"),
        col(relCol).cast("long").as("rel")), Seq("q", "d"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val observed = joined.groupBy("q")
      .agg(
        sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("n_rel_ret"),
        min(when(col("rel") >= 1, col("rank"))).as("first_rel"),
        sort_array(collect_list(struct(col("rank"), col("rel")))).as("rr"))
      .withColumn("dcg", expr(
        """aggregate(rr, cast(0 as double), (acc, x) ->
          |  acc + round((pow(2.0, x.rel) - 1.0) / log2(cast(x.rank as double) + 1.0), 9))""".stripMargin))
    val ideal = qrels
      .select(col(queryCol).as("q"), col(relCol).cast("long").as("rel"))
      .filter(col("rel") >= 1)
      .groupBy("q")
      .agg(count(lit(1)).as("n_rel"),
        slice(sort_array(collect_list(col("rel")), asc = false), 1, k).as("ideal"))
      .withColumn("idcg", expr(
        """aggregate(zip_with(ideal, sequence(1, size(ideal)), (r, i) -> struct(r, i)),
          |  cast(0 as double), (acc, x) ->
          |  acc + round((pow(2.0, x.r) - 1.0) / log2(cast(x.i as double) + 1.0), 9))""".stripMargin))
    observed.join(ideal, Seq("q"), "full_outer")
      .select(col("q").as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        round(when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double")).otherwise(lit(0.0)), 6)
          .as("mrr"),
        round(coalesce(col("n_rel_ret"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as(s"precision_at_$k"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
          coalesce(col("n_rel_ret"), lit(0L)).cast("double") /
            col("n_rel").cast("double")).otherwise(lit(0.0)), 6)
          .as(s"recall_at_$k"),
        round(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(lit(0.0)), 6)
          .as(s"ndcg_at_$k"))
  }
}
