package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: the sublinear frequency-estimation structure the
  * sketch family was missing (HLL covers distinct counts, KLL
  * quantiles, MinHash/SimHash set similarity, Bloom membership — CMS
  * covers "how often does term t occur" over a vocabulary too large to
  * count exactly).
  *
  * The sketch is a d×w integer matrix: row i counts tokens by their
  * i-salted hash bucket; a term's estimate is the MIN of its d cells —
  * never an underestimate (each cell ≥ the true count; collisions only
  * inflate), and within εN of truth with probability 1−δ at
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan 2005).
  *
  * Scale shape: the matrix is d·w cells REGARDLESS of corpus size —
  * built with ONE shuffle of (row, bucket) pairs with map-side partial
  * counts, mergeable across corpora/streams by cell-wise addition.
  * Estimates join candidates against the d·w-row sketch (AQE
  * broadcasts it — KBs). Hashing is the engine-neutral md5-derived
  * 32-bit used by every sampling/sketch operator, so cells — and
  * therefore estimates — reproduce EXACTLY in a SQL replay: the sketch
  * is oracle-checkable, unlike implementation-defined native sketch
  * binaries.
  */
object Sketches {

  /** Bucket of `token` in salted row `i`:
    * hash32(i || '_' || token) mod w. */
  private[graft] def bucket(token: Column, i: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"${i}_"), token)), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Build the sketch: (row, bucket, cnt) — d·w rows at most. `tokens`
    * is one token per input row (pre-exploded, so callers control
    * tokenization). */
  def countMin(tokens: DataFrame, tokenCol: String,
               d: Int = 4, w: Int = 1024): DataFrame =
    tokens
      .select(explode(array((0 until d).map(i =>
        struct(lit(i).as("row"), bucket(col(tokenCol), i, w).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimate each candidate's frequency from a prebuilt sketch:
    * min over the d cells the candidate hashes into. Candidates carry
    * one term per row in `termCol`; output (term, cms_est). */
  def countMinEstimate(sketch: DataFrame, candidates: DataFrame,
                       termCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val probes = candidates
      .select(col(termCol), explode(array((0 until d).map(i =>
        struct(lit(i).as("row"), bucket(col(termCol), i, w).as("bucket"))): _*))
        .as("rb"))
      .select(col(termCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    probes.join(sketch, Seq("row", "bucket"))
      .groupBy(col(termCol))
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    * 2002 / Beyer et al. 2007) — the MERGEABLE, exactly-replayable
    * alternative beside `approx_count_distinct`'s HLL: hash every
    * value to u ∈ [0, 2³²), keep the k smallest distinct hashes,
    * estimate D̂ = (k−1)·2³²/h₍ₖ₎. Union of two sketches = the k
    * smallest of the concatenation — associative and map-side
    * mergeable, which is the whole point at 100 TB: per-partition
    * sketches reduce without ever exchanging values. Fewer than k
    * distinct values means the sketch IS the exact set, so the
    * estimate degrades to exact (the standard rule). ONE row out:
    * (k, n_exact, kth_hash, est, within_bound) with within_bound =
    * |est − exact| ≤ 3·exact/√k (the ±3σ band of the estimator's
    * 1/√(k−2) relative error — a DETERMINISTIC statement here since
    * the hash is fixed; it documents the sketch is healthy, not luck).
    *
    * Determinism: hashes are exact int64 [[Sampling.hash32]] draws;
    * the k-th order statistic comes from a global TakeOrdered cut
    * (never a full sort); the estimate is one IEEE division of exact
    * integers, round 6. Both engines replay the identical hash, cut,
    * and division. */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 256,
                  salt: String = "kmv_"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashes = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .select(Sampling.hash32(col("v"), salt).as("h"))
      .distinct()
    val exact = hashes.agg(count(lit(1)).as("n_exact"))
    val kth = hashes.orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("kth_hash"), count(lit(1)).as("n_in"))
    val est = when(col("n_in") < k, col("n_exact").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
        col("kth_hash").cast("double"))
    kth.crossJoin(broadcast(exact))
      .select(lit(k).as("k"), col("n_exact"), col("kth_hash"),
        round(est, 6).as("est"),
        (abs(est - col("n_exact").cast("double")) <=
          lit(3.0) * col("n_exact").cast("double") /
            lit(math.sqrt(k.toDouble))).as("within_bound"))
  }
}
