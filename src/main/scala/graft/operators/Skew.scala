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

  /** Skew-safe equi-join for a hot-keyed FACT side against a smaller
    * (but not broadcastable) BUILD side: each fact row gets a random-ish
    * but DETERMINISTIC salt derived from `saltSource`, the build side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `saltFactor` reducers
    * instead of melting one. Row multiset is IDENTICAL to the plain
    * join (each fact row matches exactly the one replica carrying its
    * salt).
    *
    * Prefer AQE's runtime skew-join splitting when it fires; explicit
    * salting is for the cases it cannot see — skew materializing after
    * upstream operators in the same stage, or non-AQE deployments. Cost:
    * build side × saltFactor, so size the factor to the skew, not to
    * the cluster. */
  def saltedJoin(facts: DataFrame, build: DataFrame, key: String,
                 saltSource: Column, saltFactor: Int = 16): DataFrame = {
    val salted = facts.withColumn("__salt", saltColumn(saltSource, saltFactor))
    val replicated = build
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
