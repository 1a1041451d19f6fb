package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators — the aggregate-level
  * counterpart of the per-string scrubbing in
  * [[graft.functions.TextAnalysis.redactPii]]: a training corpus that
  * carries structured user attributes (or a metadata sidecar published
  * with one) must not let rare attribute combinations single out an
  * individual. k-anonymity (Sweeney 2002) is the standard floor: every
  * released quasi-identifier combination must be shared by ≥ k rows.
  *
  * Scale shape: one shuffle on the quasi-identifier columns (a window
  * COUNT needs no sort buffer — Spark aggregates each group in one
  * pass), and the row count is unchanged; nothing here is quadratic or
  * driver-bound. Hot QI groups are the COMMON combinations — precisely
  * the ones that need no suppression — so skew cannot concentrate
  * sensitive work.
  */
object Privacy {

  /** Single-pass k-anonymity by suppression: every quasi-identifier
    * column of a row whose QI group has fewer than `k` members is
    * nulled (types preserved), and `qi_group_n` reports the ORIGINAL
    * group size so downstream audits can grade the suppression rate.
    * Non-QI columns pass through untouched.
    *
    * This is one suppression round, not full Samarati/Incognito
    * generalization-lattice search: suppressed rows collapse into an
    * all-null QI group that is itself released (standard practice —
    * the null group reveals only "rare combination", never which one).
    * Callers wanting hierarchy-aware coarsening (city→state→country)
    * should pre-map columns through their hierarchy and re-run. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    val counted = df.withColumn("qi_group_n", count(lit(1)).over(w))
    qiCols.foldLeft(counted) { (acc, c) =>
      acc.withColumn(c,
        when(col("qi_group_n") < k, lit(null)).otherwise(col(c)))
    }
  }

  /** The audit: per released QI group, its size and whether it meets
    * the floor — what a data-release review signs off on. Run AFTER
    * [[kAnonymize]] (expect only the all-null suppressed group below
    * k... which is exactly the rows whose identity was withheld) or
    * before it (to size the problem). */
  def anonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("meets_k", col("n") >= k)

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is
    * defeated by a homogeneous group — 50 rows sharing one QI
    * combination AND one sensitive value reveal that value for anyone
    * known to be in the group. Per QI group: its size, the number of
    * DISTINCT sensitive values, and whether it meets the diversity
    * floor `l`. Same single-shuffle shape as [[anonymityAudit]]
    * (count-distinct partials are map-side). */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("meets_l", col("n_sensitive") >= l)
}
