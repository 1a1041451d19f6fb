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
  def scoreKN(docs: DataFrame, idCol: String, textCol: String,
              model: KNModel, discount: Double = 0.75): DataFrame = {
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
      .select(col("id").as(idCol), col("n_bigrams"),
        round(expr("aggregate(ps, cast(0 as double), (acc, x) -> acc + x)") /
          col("n_bigrams").cast("double"), 6).as("avg_kn_prob"))
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
