package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for reproducible
  * training-data splits.
  *
  * `df.sample()` is seeded per-partition — results change with
  * partitioning, executor count, and engine, which is poison for
  * reproducible dataset curation. Hash-sampling decides membership from
  * the ROW KEY alone (md5-derived bucket in [0,10000)), so a row's
  * split assignment is stable across runs, partitionings, engines and
  * even re-ingestions of the same data. Pure map-side — no shuffle, no
  * state; the predicate pushes into the scan where Catalyst allows.
  */
object Sampling {

  /** Stable bucket in [0, 10000) from the key's md5. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(10000L))

  /** Keep ~fraction of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < (fraction * 10000).toLong)

  /** Disjoint deterministic train/test split by key: test gets
    * ~testFraction, train the rest. Same key always lands on the same
    * side — no leakage across re-runs. */
  def trainTestSplit(df: DataFrame, key: Column,
                     testFraction: Double): (DataFrame, DataFrame) = {
    val cut = (testFraction * 10000).toLong
    (df.filter(hashBucket(key) >= cut), df.filter(hashBucket(key) < cut))
  }

  /** Temperature resampling for source mixing: DOWN-sample each group
    * toward a flatter distribution, keeping rate
    * `r_g = (n_min / n_g)^(1-alpha)` — `alpha = 1` keeps everything,
    * `alpha = 0` equalizes every group to ~n_min rows, values between
    * interpolate (the n^alpha mixing rule, downsampling-only form).
    * Membership is decided by the md5 hash bucket of the row key, so
    * the SAME rows are kept across runs, partitionings and engines.
    *
    * One tiny count aggregation (broadcast back); the keep-filter is
    * map-side. NOTE on determinism: with `alpha = 0.5` the rate is a
    * pure `sqrt` — IEEE-exact in every engine; other alphas go through
    * `pow`, which may differ in the last ulp across libm
    * implementations (only rows exactly on a bucket boundary could
    * flip). */
  def temperatureResample(df: DataFrame, groupCol: String, key: Column,
                          alpha: Double = 0.5): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__n")).as("__nmin"))))
    val rated = withMin.withColumn("__rate",
      when(lit(alpha) === 0.5,
        sqrt(col("__nmin").cast("double") / col("__n").cast("double")))
        .otherwise(pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - alpha))))
      .select(col(groupCol), col("__rate"))
    df.join(broadcast(rated), groupCol)
      .filter(hashBucket(key).cast("double") < col("__rate") * 10000.0)
      .drop("__rate")
  }

  /** Deterministic stratified sampling: exactly min(perStratum, |stratum|)
    * rows from every stratum, chosen by md5 order of the key — a
    * class-balanced subset that is stable across runs, partitionings
    * and engines (the md5 order is the "random" permutation).
    *
    * One shuffle on the strata columns; within each stratum the
    * window's rank is computed after a partition-local sort. For very
    * hot strata at 100 TB, pre-filter with [[hashSample]] at a fraction
    * safely above perStratum/|stratum| to bound the sorted volume, then
    * stratify exactly. Ties (md5 collisions) break on the key itself. */
  def stratified(df: DataFrame, strataCols: Seq[String], key: Column,
                 perStratum: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }
}
