package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring — the CCNet/KenLM-style
  * "does this text look like the reference corpus" quality filter, the
  * standard statistical gate between heuristic quality scores and
  * model-based classifiers in a training-data pipeline.
  *
  * The model is add-one-smoothed bigram MLE: p(w2 | w1) =
  * (c(w1,w2) + 1) / (c(w1·) + V), fit on a reference corpus. A
  * document's score is its MEAN per-bigram probability. The mean of
  * probabilities (not log-perplexity) is deliberate: every per-bigram
  * probability is ONE IEEE division of exact longs and the document
  * roll-up is a LEFT FOLD over the SORTED probability list, so scores
  * reproduce bit-for-bit across engines — `ln`/`log` are not
  * correctly-rounded by IEEE and would break the hash-equality oracle
  * discipline (see Queries.scala header). Rank order under the mean
  * tracks the perplexity order closely enough for a cutoff filter, and
  * a caller that wants true log-perplexity can take logs of the same
  * per-bigram probabilities downstream.
  *
  * Scale shape: fitting is two hash aggregations over the reference's
  * (w1, w2) pairs — map-side partials, shuffle on bounded-width token
  * keys; vocabulary size is ONE scalar to the driver (bounded model
  * state, the learned-index posture shared with IVF/PQ). Scoring is two
  * equi-joins of the document bigrams against the count tables — AQE
  * broadcasts them when the vocabulary is small (Heaps' law:
  * vocabulary grows sub-linearly in corpus size) — plus one per-doc
  * aggregation.
  */
object NgramLM {

  /** Fitted model: bigram counts (w1, w2, c12), context counts
    * (w1, c1), and the reference vocabulary size for smoothing. The two
    * count tables are DataFrames — persist them with
    * [[graft.core.Catalog.saveBucketed]] on w1 for the score-many-
    * batches posture. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         vocabSize: Long)

  /** (id, w1, w2) consecutive token pairs of every document. The
    * `size >= 2` filter is load-bearing: Spark's `sequence(1, 0)` is
    * DESCENDING [1, 0], so a single-token doc would index past the
    * array instead of producing zero bigrams. */
  private def bigramTable(df: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  def fit(reference: DataFrame, idCol: String, textCol: String): Model = {
    val bg = bigramTable(reference, idCol, textCol)
    val bigrams = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val contexts = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = reference
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    Model(bigrams, contexts, vocab)
  }

  /** Per-document LM score: (id, n_bigrams, avg_prob) — docs with fewer
    * than two tokens have no bigrams and drop out, mirroring the SQL
    * formulation. `avg_prob` is rounded to 6 decimals after the pinned
    * fold, the same presentation contract as the similarity scores. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val v = lit(model.vocabSize)
    val p: Column =
      (coalesce(col("c12"), lit(0L)) + 1L).cast("double") /
        (coalesce(col("c1"), lit(0L)) + v).cast("double")
    bigramTable(docs, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .withColumn("p", p)
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(col("p"))).as("ps"))
      .select(col("id").as(idCol), col("n_bigrams"),
        round(expr("aggregate(ps, cast(0 as double), (acc, x) -> acc + x)") /
          col("n_bigrams").cast("double"), 6).as("avg_prob"))
  }

  /** Interpolated Kneser–Ney model state: bigram counts, per-context
    * totals c(w1·) with distinct-follower counts N1+(w1·), per-word
    * distinct-predecessor counts N1+(·w2), the distinct-bigram-type
    * total N1+(··) and the vocabulary size. The two scalars are
    * bounded model state (two longs to the driver); the tables are
    * vocabulary-sized. */
  final case class KNModel(bigrams: DataFrame, contexts: DataFrame,
                           continuations: DataFrame, nTypes: Long,
                           vocabSize: Long)

  /** Fit interpolated Kneser–Ney bigram statistics (Kneser & Ney 1995;
    * Chen & Goodman 1998 — the KenLM default, and the smoothing the
    * CCNet perplexity filter actually runs). Everything derives from
    * ONE bigram-type aggregation: c(w1·) and N1+(w1·) roll up from the
    * type table (map-side partials on token keys), as does N1+(·w2). */
  def fitKN(reference: DataFrame, idCol: String, textCol: String): KNModel = {
    val bigrams = bigramTable(reference, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val contexts = bigrams.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val continuations = bigrams.groupBy("w2")
      .agg(count(lit(1)).as("n1p"))
    val nTypes = bigrams.count()
    val vocab = reference
      .select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    KNModel(bigrams, contexts, continuations, nTypes, vocab)
  }

  /** Per-document interpolated Kneser–Ney score:
    * (id, n_bigrams, avg_kn_prob), the mean of per-bigram
    *   p(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + D·N1+(w1·)/c(w1·) · p_cont(w2)
    * with p_cont(w2) = N1+(·w2)/N1+(··) — the continuation probability
    * that makes KN the standard: "Francisco" is frequent but follows
    * almost nothing, so its backoff weight is tiny. D = 0.75 (exact in
    * binary — the discount arithmetic is bit-reproducible). Unseen
    * CONTEXTS score the bare continuation probability; unseen WORDS
    * score the 1/(N1+(··) + V) floor — both choices are deliberate
    * (the scoring filter needs a total, deterministic function, not a
    * normalized sampler) and mirrored in the oracle. Per-bigram p is a
    * fixed-shape IEEE expression over exact integer counts; the
    * roll-up is the house left fold over the sorted list.
    *
    * Scale shape identical to [[score]]: three equi-joins against
    * vocabulary-sized count tables (AQE broadcasts them when small) +
    * one per-doc aggregation. */
  /** Shared KN per-doc kernel: (id, n_bigrams, ps) with `ps` the
    * doc's bigram probabilities collected SORTED ascending — the
    * deterministic fold order for [[scoreKN]]'s mean and, for free,
    * exactly the prefix [[minKProb]] needs. */
  private def knDocProbs(docs: DataFrame, idCol: String, textCol: String,
                         model: KNModel, discount: Double): DataFrame = {
    val d = lit(discount)
    val pcont: Column = coalesce(
      col("n1p").cast("double") / lit(model.nTypes).cast("double"),
      lit(1.0) / lit(model.nTypes + model.vocabSize).cast("double"))
    val p: Column = when(col("c1").isNotNull,
      greatest(coalesce(col("c12"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("c1").cast("double") +
        (d * col("n1f").cast("double") / col("c1").cast("double")) * pcont)
      .otherwise(pcont)
    bigramTable(docs, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .join(model.continuations, Seq("w2"), "left")
      .withColumn("p", p)
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(col("p"))).as("ps"))
  }

  def scoreKN(docs: DataFrame, idCol: String, textCol: String,
              model: KNModel, discount: Double = 0.75): DataFrame =
    knDocProbs(docs, idCol, textCol, model, discount)
      .select(col("id").as(idCol), col("n_bigrams"),
        round(expr("aggregate(ps, cast(0 as double), (acc, x) -> acc + x)") /
          col("n_bigrams").cast("double"), 6).as("avg_kn_prob"))

  /** Min-K% prob membership inference (Shi et al., "Detecting
    * Pretraining Data from Large Language Models", 2023): a document
    * the model trained on has FEW low-probability tokens, so the mean
    * of its lowest k% token probabilities separates members from
    * non-members far better than the overall mean (which common
    * high-probability tokens dominate). Here over the [[fitKN]]
    * bigram LM: per doc, the lowest ceil(kPct%) of its KN bigram
    * probabilities — `ps` is already collected sorted, so the tail
    * is a slice — averaged by one exact division. `member` flags
    * docs whose score exceeds the CORPUS MEAN of the scores (the
    * paper thresholds on a validation split; a data pipeline has no
    * labels, and the above-mean rule is scale-free): the comparison
    * is mk_int·N > Σ mk_int on 1e-6 fixed-pointed scores — pure
    * int64, no float boundary, no division (int64-safe to ~9e12
    * docs at score ≤ 1, named).
    *
    * Scale shape identical to [[scoreKN]]: three vocab-keyed joins +
    * one doc-keyed aggregation (the corpus-total side is a 1-row
    * broadcast); per-doc state is the doc's own bigram list, bounded
    * by document length. */
  def minKProb(docs: DataFrame, idCol: String, textCol: String,
               model: KNModel, discount: Double = 0.75,
               kPct: Int = 20): DataFrame = {
    require(kPct >= 1 && kPct <= 100, "kPct must be in [1, 100]")
    val scored = knDocProbs(docs, idCol, textCol, model, discount)
      .withColumn("k",
        expr(s"(n_bigrams * $kPct + 99) div 100").cast("long"))
      .withColumn("mk",
        expr("aggregate(slice(ps, 1, CAST(k AS INT)), cast(0 as double), " +
          "(acc, x) -> acc + x)") / col("k").cast("double"))
      .withColumn("mk_int", round(col("mk") * 1e6, 0).cast("long"))
    val totals = scored.agg(sum(col("mk_int")).as("s_total"),
      count(lit(1)).as("n_total"))
    scored.crossJoin(org.apache.spark.sql.functions.broadcast(totals))
      .select(col("id").as(idCol), col("n_bigrams"), col("k"),
        round(col("mk"), 6).as("min_k_avg"),
        (col("mk_int") * col("n_total") > col("s_total")).as("member"))
  }

  /** PMI collocation mining (phrase detection): the top-k adjacent
    * word pairs by pointwise mutual information,
    * pmi = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p from corpus-wide
    * bigram/unigram counts — the classic phrase-promotion signal
    * (Church & Hanks 1990; the word2vec phrase pass scores the same
    * ratio). Output: (w1, w2, n_ab, pmi), pmi = round(…, 6) computed
    * as ONE double expression over exact integer counts (left-assoc
    * products, the engine-mirroring discipline), ranked under the
    * total (pmi desc, w1, w2) order.
    *
    * Scale shape: two decomposable count aggregations (bigram,
    * unigram) — map-side partials, no windows; the `minCount` filter
    * lands BEFORE the unigram joins, pruning the hapax tail that
    * dominates bigram vocabulary at corpus scale; the top-k is a
    * TakeOrdered, never a global sort. The unigram join is keyed on
    * the word — vocabulary-sized, so Spark may broadcast it at small
    * scale and shuffle-join at 100 TB; both are correct. */
  def pmiPhrases(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val bg = bigramTable(docs, idCol, textCol)
    val uni = docs.select(explode(split(col(textCol), " ")).as("t"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val cu = uni.groupBy("t").agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("n"))
      .crossJoin(bg.agg(count(lit(1)).as("nb")))
    cb.join(cu.select(col("t").as("w1"), col("c").as("ca")), "w1")
      .join(cu.select(col("t").as("w2"), col("c").as("cb")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12").as("n_ab"),
        round(log((col("c12").cast("double") * col("n") * col("n")) /
          (col("nb").cast("double") * col("ca") * col("cb"))), 6).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }
}
