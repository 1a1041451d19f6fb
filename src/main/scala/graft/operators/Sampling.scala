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
