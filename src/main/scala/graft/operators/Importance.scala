package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** DSIR-style data selection: score every document by how much more
  * likely its hashed-n-gram profile is under a TARGET distribution
  * (e.g. the English subset, a wiki-like seed, a curated reference)
  * than under the raw corpus, then resample proportionally — the
  * importance-resampling move of Xie et al., "Data Selection for
  * Language Models via Importance Resampling" (NeurIPS 2023),
  * re-expressed for engine-exact arithmetic.
  *
  * LINEARIZED likelihood ratio: DSIR proper scores log p̂_t(x) −
  * log p̂_r(x) under bag-of-hashed-ngrams models; logs are libm
  * territory (last-ulp divergence across engines — the one thing this
  * codebase never ships into a hash-compared column). Instead the
  * profile likelihood is linearized to the mixture-weighted form
  *
  *   importance(x) = (Σ_b c_b(x)·t_b / T) / (Σ_b c_b(x)·r_b / R)
  *                 = (Σ_b c_b(x)·t_b) · R  /  ((Σ_b c_b(x)·r_b) · T)
  *
  * with c_b the doc's hashed-bucket counts, t_b/r_b the (+smooth
  * Laplace) target/raw bucket totals and T/R their sums: every term an
  * exact int64, ONE final IEEE division — bit-reproducible anywhere.
  * Same monotone intent (target-like docs up, raw-typical docs down),
  * none of the transcendental hazard.
  *
  * Scale shape: the model is `dim` int64 cells per class — ONE
  * map-side-partial aggregation over the corpus, collected as BOUNDED
  * driver state (dim ≤ a few thousand) and re-embedded as literal
  * weights, so scoring is a pure codegen'd map pass over the scan with
  * ZERO shuffle and ZERO broadcast. Exactness bound: the int64 products
  * need doc_tokens · max(t_b) · max(T,R) < 2⁶³; at corpus sizes beyond
  * ~10¹² total tokens, pre-scale the totals (divide both t_b/T and
  * r_b/R cells by a common power of two — the RATIO is unchanged) or
  * accept the double path; the exact mode is the oracle configuration.
  */
object Importance {

  /** Per-document importance weights: adds `imp_num`, `imp_den` (exact
    * int64) and `importance` = imp_num/imp_den (one IEEE division).
    * `isTarget` marks the rows whose distribution the corpus should be
    * steered toward; rows are scored whether or not they are targets.
    * NULL text is featurized as the empty string (a NULL feature vector
    * would otherwise propagate into a NULL importance, and NULLS-FIRST
    * ordering would hand such docs every top-k slot downstream). Docs
    * with no featurizable text get importance 1.0 via the 0/0 guard:
    * no evidence either way — Laplace smoothing keeps the bucket
    * totals positive, so num = den = 0 only for an empty gram array
    * (e.g. n-grams over text shorter than n). */
  def hashedImportance(df: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, dim: Int = 16, n: Int = 1,
                       smooth: Long = 1L): DataFrame = {
    require(dim > 0 && smooth >= 1, "need dim > 0 and smoothing >= 1")
    val feats = TextAnalysis.hashedNgramFeatures(
      coalesce(col(textCol), lit("")), dim, n)
    val featured = df.withColumn("__f", feats)
      .withColumn("__t", isTarget)

    // one aggregation pass -> 2*dim bounded driver cells
    val cells = featured
      .select(posexplode(col("__f")).as(Seq("b", "c")), col("__t"))
      .groupBy(col("b"))
      .agg(sum(when(col("__t"), col("c")).otherwise(0L)).as("tc"),
        sum(col("c")).as("rc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val t = (0 until dim).map(b => smooth + cells.get(b).map(_._1).getOrElse(0L))
    val r = (0 until dim).map(b => smooth + cells.get(b).map(_._2).getOrElse(0L))
    val tTot = t.sum
    val rTot = r.sum

    def dot(w: Seq[Long]): Column = w.zipWithIndex
      .map { case (wb, b) => lit(wb) * element_at(col("__f"), b + 1) }
      .reduceLeft(_ + _)

    featured
      .withColumn("imp_num", dot(t) * lit(rTot))
      .withColumn("imp_den", dot(r) * lit(tTot))
      .withColumn("importance",
        when(col("imp_den") === 0L, lit(1.0)) // featureless doc: no evidence
          .otherwise(col("imp_num").cast("double") / col("imp_den").cast("double")))
      .drop("__f", "__t")
  }

  /** The selection step: deterministic importance resampling — keep
    * `keep` documents drawn with probability proportional to
    * importance, without replacement, via the salted single-division
    * priority scheme ([[Sampling.weightedTopK]]; priority =
    * hash32/weight, smallest win). Global top-k, NOT a global window:
    * TakeOrderedAndProject keeps a `keep`-row heap per partition and
    * merges on the driver — the corpus (text included) never moves to
    * a single task. */
  def resampleByImportance(df: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, keep: Int,
                           dim: Int = 16, n: Int = 1): DataFrame = {
    val scored = hashedImportance(df, idCol, textCol, isTarget, dim, n)
    // importance > 0 by construction: Laplace smoothing keeps every
    // bucket total >= 1, so any doc with a token has imp_num > 0,
    // NULL text is featurized as "" (never a NULL score), and the
    // featureless fallback is exactly 1.0 — skipping the guard
    // stops Catalyst inlining the featurizer 34x into a pushed filter.
    Sampling.weightedTopK(scored, col(idCol), col("importance"), keep,
      weightProvablyPositive = true)
  }
}
