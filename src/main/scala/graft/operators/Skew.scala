package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase (salted) aggregation for hot keys.
  *
  * A plain `groupBy(k).agg(sum)` sends every row of a hot key to one
  * reducer. Salting splits each key into `saltFactor` sub-groups for
  * the partial aggregation, then re-aggregates the partials — the hot
  * key's work spreads over `saltFactor` reducers and the final shuffle
  * carries only `saltFactor` rows per key. For decomposable aggregates
  * (sum/count/min/max) the result is IDENTICAL to the unsalted form —
  * the oracle-checked query `q_salted_agg` proves it against a plain
  * GROUP BY.
  *
  * AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not rebalance (partial aggregation already bounds it
  * in most cases — salting matters when the DISTINCT-like or
  * collect-like state per key is itself large).
  */
object Skew {

  /** Deterministic salt from a high-cardinality column (hash-mod). */
  def saltColumn(source: Column, saltFactor: Int): Column =
    pmod(xxhash64(source), lit(saltFactor)).cast("int")

  /** Two-phase sum of `valueExpr` (use an exact/decimal expression for
    * bit-reproducibility) grouped by `keys`. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueExpr: Column,
                saltSource: Column, outName: String,
                saltFactor: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", saltColumn(saltSource, saltFactor))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(valueExpr).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(outName), sum(col("__n")).as(s"${outName}_n"))
  }
}
