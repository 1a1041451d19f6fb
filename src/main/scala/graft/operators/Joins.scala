package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in surface. Preference order per
  * the build plan: these COMPOSE existing operators (equi-join + window)
  * rather than adding a custom SparkPlan — Catalyst still sees standard
  * shuffles it can optimize, AQE still handles skew.
  */
object Joins {

  /** Backward as-of join: for each left row, the single right row with
    * the greatest `rightTime` <= `leftTime` within the same key
    * (deterministic tie-break on `tieBreak` desc). Inner semantics:
    * left rows with no qualifying right row are dropped.
    *
    * Plan shape: equi-join on the key with the time inequality as a
    * residual condition, then a per-left-row window picks the latest.
    * At 100 TB the equi-join bounds the blowup to rows-per-key; for
    * high-frequency data the standard refinement is time-bucketing the
    * right side (join on (key, bucket) over the left bucket and its
    * predecessor) — same output, bounded candidates per row.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column,
                   leftId: Column, tieBreak: Column): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime)
    val w = Window.partitionBy(leftId).orderBy(rightTime.desc, tieBreak.desc)
    joined.withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Bucketed point-in-window range join: all (left, right) pairs with
    * the same key and `rightTime` in `[leftTime, leftTime + window)`.
    *
    * A naive theta join on the time inequality is a per-key cartesian
    * product that Spark plans as a nested loop; bucketing time by the
    * window length turns it into an EQUI-join: a right row in bucket b
    * can only match left rows in buckets {b-1, b}, so the left side is
    * exploded to those two buckets and the residual inequality is a
    * cheap post-filter. Shuffle is on (key, bucket) — bounded
    * candidates per row, AQE-splittable on hot buckets. */
  def pointInWindowJoin(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String],
                        leftTime: Column, rightTime: Column,
                        windowMicros: Long): DataFrame = {
    val lb = floor(unix_micros(leftTime) / windowMicros)
    val rb = floor(unix_micros(rightTime) / windowMicros)
    val lExp = left.withColumn("__bucket", explode(array(lb, lb + 1)))
    val rExp = right.withColumn("__bucket", rb)
    lExp.join(rExp, keyCols :+ "__bucket")
      .filter(unix_micros(rightTime) >= unix_micros(leftTime) &&
        unix_micros(rightTime) - unix_micros(leftTime) < windowMicros)
      .drop("__bucket")
  }
}
