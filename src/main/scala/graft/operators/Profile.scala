package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "describe my table" primitive every
  * warehouse engine ships (row/null/distinct counts, min/max per
  * column), used here as the first gate of data-quality monitoring on
  * incoming training-data drops.
  *
  * Scale design: ALL columns profile in a SINGLE aggregation over one
  * scan — partial aggregation is map-side, the shuffle carries one
  * state row per partition. Distinct counts default to
  * `approx_count_distinct` (HLL++, one pass, mergeable sketch);
  * `exact = true` switches to `count(DISTINCT …)`, which Catalyst plans
  * via Expand — the input replicates once per distinct column, so keep
  * exact mode for oracle checks and small tables, approx for the
  * 100 TB path. min/max are cast to string AFTER aggregating (typed
  * comparisons, uniform output schema).
  */
object Profile {

  /** (column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)
    * — one output row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__cnt`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)"))
  }
}
