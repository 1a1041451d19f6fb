package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with a held-out evaluation set — the standard guard against
  * test-set leakage in LLM training corpora (the reference has no
  * analog; this extends its dedup story to CROSS-corpus overlap).
  *
  * Scale design (100 TB train / MB-scale benchmark):
  *  - the benchmark side is exploded to its DISTINCT n-grams — a tiny
  *    relation (|benchmark| × ngrams/doc) that Catalyst/AQE broadcasts,
  *    so the train side is a map-side semi-join probe inside the scan
  *    stage: the 100 TB corpus is read once and never shuffled;
  *  - n-gram extraction is the same single-pass native expression the
  *    dedup family uses ([[graft.plans.TextExpressions.WordNgrams]]);
  *  - output is per-train-doc collision counts, so downstream policy
  *    (drop / flag / re-bucket) stays a cheap filter.
  */
object Decontaminate {

  /** (id, gram) distinct n-grams per document. */
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))

  /** Per-train-doc contamination report: which training docs contain
    * any of the benchmark's n-grams, with collision counts.
    * Output: (doc_id, n_hit_grams, n_test_docs) — n_hit_grams counts
    * the train doc's distinct n-grams seen anywhere in the benchmark,
    * n_test_docs counts distinct benchmark docs sharing at least one. */
  def contaminated(train: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val trainGrams = grams(train, idCol, textCol, n)
    val testGrams = grams(benchmark, idCol, textCol, n)
      .select(col("gram"), col("id").as("test_id"))
    trainGrams.join(testGrams, "gram")
      .groupBy(col("id").as("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hit_grams"),
        countDistinct(col("test_id")).as("n_test_docs"))
  }

  /** Per-BENCHMARK contamination report — the release-gate artifact an
    * eval team reviews before trusting any score: for each benchmark
    * (keyed by `benchCol` in a stacked benchmark table), how many
    * training docs touch it, how many of ITS docs are touched, the
    * distinct colliding-gram volume, and the benchmark's size for
    * rate computation. Same join shape as [[contaminated]] (benchmark
    * grams are the small broadcast side at scale) with one extra
    * bounded-key rollup — benchmarks are units, so the output is a
    * handful of rows regardless of corpus size. Every benchmark in
    * the input appears in the report: a benchmark with ZERO colliding
    * grams shows explicit 0s (benchSizes is the left side), so a
    * consumer can tell "clean benchmark" from "benchmark not
    * checked". */
  def report(train: DataFrame, benchmarks: DataFrame, idCol: String,
             textCol: String, benchCol: String, n: Int = 8): DataFrame = {
    val trainGrams = grams(train, idCol, textCol, n)
    val testGrams = benchmarks.select(col(benchCol).as("benchmark"),
      col(idCol).as("test_id"),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
    val benchSizes = benchmarks.groupBy(col(benchCol).as("benchmark"))
      .agg(countDistinct(col(idCol)).as("n_bench_docs"))
    val hits = trainGrams.join(testGrams, "gram")
      .groupBy("benchmark")
      .agg(countDistinct(col("id")).as("n_train_docs_hit"),
        countDistinct(col("test_id")).as("n_bench_docs_hit"),
        countDistinct(col("gram")).as("n_grams_hit"))
    benchSizes.join(hits, Seq("benchmark"), "left")
      .select(col("benchmark"),
        coalesce(col("n_train_docs_hit"), lit(0L)).as("n_train_docs_hit"),
        coalesce(col("n_bench_docs_hit"), lit(0L)).as("n_bench_docs_hit"),
        coalesce(col("n_grams_hit"), lit(0L)).as("n_grams_hit"),
        col("n_bench_docs"))
  }

  /** Decontaminated corpus: training docs whose contamination stays
    * under `maxHitGrams` (0 = drop on any overlap). Anti-join — the
    * corpus never shuffles when the contaminated set is small. */
  def clean(train: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, n: Int = 8, maxHitGrams: Long = 0): DataFrame = {
    val bad = contaminated(train, benchmark, idCol, textCol, n)
      .filter(col("n_hit_grams") > maxHitGrams)
      .select(col("doc_id").as(idCol))
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** [[contaminated]] with a Bloom pre-filter on the train side — the
    * 100 TB shape. [[contaminated]] explodes EVERY training doc to
    * (doc, gram) rows before the broadcast probe discards ~all of them;
    * here a Bloom filter over the benchmark's distinct grams
    * ([[graft.plans.BloomExpressions]], MBs, built in one distributed
    * pass) tests each doc's shingle array INSIDE the scan stage, and
    * only docs with ≥1 possible hit pay the explode + exact join. No
    * false negatives ⇒ the surviving sliver is a superset of the truly
    * contaminated docs; the exact join then removes the false
    * positives, so the result is IDENTICAL to [[contaminated]] — which
    * is exactly what the shared oracle checks.
    *
    * `expectedGrams` sizes the filter (over-sizing costs bits, not
    * correctness; ~1.2 MB per million grams at fpp=0.03). */
  def contaminatedBloom(train: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, n: Int = 8,
                        expectedGrams: Long = 1L << 20,
                        fpp: Double = 0.03): DataFrame = {
    val testGrams = grams(benchmark, idCol, textCol, n).select("gram").distinct()
    val bloom = graft.plans.BloomExpressions.buildBloom(
      testGrams, "gram", expectedGrams, fpp)
    val suspicious = train.filter(
      graft.plans.BloomExpressions.bloom_hits(
        Dedup.shingles(col(textCol), n), bloom) > 0)
    contaminated(suspicious, benchmark, idCol, textCol, n)
  }

  /** Embedding-space decontamination: drop every training row whose
    * embedding has cosine ≥ `threshold` against ANY benchmark
    * embedding — catches paraphrased/reworded benchmark leakage that
    * n-gram overlap ([[contaminated]]) cannot see.
    *
    * Scale shape: benchmark sets are small by nature (thousands of
    * rows), so the eval side is force-broadcast and the corpus streams
    * through a broadcast nested-loop ANTI join — one scan of the
    * corpus, no shuffle of either side, exactly the [[Similarity
    * .bruteForceTopK]] posture. For benchmark sets too big to
    * broadcast, pre-bucket both sides with [[Similarity
    * .lshCosinePairs]]'s tables instead. */
  def byEmbedding(train: DataFrame, benchmark: DataFrame,
                  idCol: String, embCol: String,
                  threshold: Double = 0.95): DataFrame = {
    val t = Similarity.prepared(train, idCol, embCol)
      .select(col("id").as("__tid"), col("emb").as("__temb"),
        col("n2").as("__tn2"))
    val b = Similarity.prepared(benchmark, idCol, embCol)
      .select(col("emb").as("__bemb"), col("n2").as("__bn2"))
    val kept = t.join(broadcast(b),
      Similarity.dot(col("__temb"), col("__bemb")) /
        sqrt(col("__tn2") * col("__bn2")) >= threshold,
      "left_anti")
    train.join(kept.select(col("__tid").as(idCol)), Seq(idCol), "left_semi")
  }
}
