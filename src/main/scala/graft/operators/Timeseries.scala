package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * grid and forward-fill the gaps — the step every monitoring /
  * feature-engineering pipeline runs before windowed models, and a
  * capability the reference's snapshot loads have no answer to.
  *
  * Scale shape: one aggregation to the (key, bucket) grain, one tiny
  * per-key span aggregate whose `sequence` explode regenerates the
  * dense grid (rows = keys × span buckets — bound the span upstream
  * for sparse keys with multi-year gaps), a left equi-join back, and
  * one per-key window for the fill. Everything shuffles on the key:
  * no driver loops, no cross products.
  */
object Timeseries {

  /** Dense per-key time grid from each key's min to max bucket with
    * `agg` computed where data exists, nulls forward-filled from the
    * last observed bucket (`last(..., ignoreNulls)` — each key's first
    * bucket always has data, so the fill is total). Output:
    * keys, `bucket`, `v_filled`, `is_gap`.
    *
    * `unit` is any `date_trunc` unit with a matching 1-unit interval
    * step ("minute", "hour", "day", "week", "month"). */
  def gapFill(df: DataFrame, keys: Seq[String], tsCol: String, agg: Column,
              unit: String = "hour"): DataFrame = {
    val k = keys.map(col)
    val bucketed = df
      .groupBy(k :+ date_trunc(unit, col(tsCol)).as("bucket"): _*)
      .agg(agg.as("v"))
    val grid = bucketed
      .groupBy(k: _*).agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(k :+ explode(sequence(col("lo"), col("hi"),
        expr(s"interval 1 $unit"))).as("bucket"): _*)
    val w = Window.partitionBy(k: _*).orderBy(col("bucket"))
    grid.join(bucketed, keys :+ "bucket", "left")
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v").isNull)
      .drop("v")
  }

  /** Cohort retention: assign every entity to the cohort of its FIRST
    * active `unit` bucket, then count distinct entities per (cohort,
    * offset) cell — the classic retention triangle. Output:
    * `cohort` (yyyy-MM-dd of the cohort bucket), `offset` (whole
    * units since the cohort bucket, 0 = the cohort cell itself),
    * `n_active`.
    *
    * Scale shape: the raw stream collapses to distinct (entity,
    * bucket) FIRST (one shuffle on the entity key; map-side distinct
    * partials), so the min-bucket cohort aggregate and the join back
    * both run over the collapsed activity table, never the raw event
    * stream — at 100 TB of events the distinct table is bounded by
    * entities × active buckets. The final rollup groups by (cohort,
    * offset): a few hundred cells, map-side partials, no skew (counts
    * are exact since (entity, bucket) rows are already distinct —
    * count(*), not a second countDistinct shuffle). */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
                       unit: String = "week"): DataFrame = {
    val daysPerUnit = unit match {
      case "day" => 1; case "week" => 7
      case other => throw new IllegalArgumentException(
        s"unit=$other unsupported: offsets need a fixed day width")
    }
    val active = df
      .select(col(entityCol).as("e"), date_trunc(unit, col(tsCol)).as("bucket"))
      .distinct()
    val cohorts = active.groupBy("e").agg(min(col("bucket")).as("c0"))
    active.join(cohorts, "e")
      .groupBy(date_format(col("c0"), "yyyy-MM-dd").as("cohort"),
        (datediff(col("bucket"), col("c0")) / daysPerUnit).cast("int").as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
