package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout keys for multi-dimensional data skipping. Sorting a
  * 100 TB table by ONE column gives parquet min/max pruning on that
  * column only; interleaving the bits of two dimension columns into a
  * Z-order (Morton) key and range-partitioning + sorting by it makes
  * every file span a narrow RECTANGLE of both dimensions, so point and
  * range predicates on either column prune files. This is the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, computed here as a
  * codegen'd kernel: write path = `repartitionByRange(zorder_key(a,b))
  * .sortWithinPartitions(...)` then plain parquet — the engine's
  * existing min/max stats do the skipping, no new reader needed.
  *
  * The kernel interleaves the low 16 bits of each dimension (callers
  * bucket/quantize wider domains first — layout keys need locality,
  * not exactness) via the standard mask-spread; bit i of `a` lands at
  * 2i, bit i of `b` at 2i+1.
  */
object LayoutExpressions {

  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * value (classic Morton mask sequence). */
  def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton key kernel, callable from generated Java. */
  def computeZOrder(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)

  case class ZOrderKey(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder_key"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      computeZOrder(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.LayoutExpressions$$.MODULE$$.computeZOrder($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def zorder_key(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ColumnBridge
    br.column(ZOrderKey(
      br.expression(a.cast("long")), br.expression(b.cast("long"))))
  }
}
