package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable form (`zip_with` + `aggregate`, see
  * [[graft.operators.Similarity]]) materializes an intermediate array
  * per pair and evaluates a lambda per element — fine semantically,
  * wasteful at billions of pairs. These expressions fuse the loop into
  * one codegen'd pass with zero allocation, while preserving the exact
  * left-to-right double summation order, so results are bit-identical
  * to the fold form (and to the DuckDB oracle).
  *
  * Preference order per the build guide: built-ins first; a custom
  * `Expression` with `doGenCode` exactly here, where the built-in
  * formulation demonstrably allocates; no full LogicalPlan/Strategy
  * needed for a scalar.
  */
object VectorExpressions {

  private def elemAccessor(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other      => throw new IllegalArgumentException(
        s"vector expressions need array<float|double>, got $other")
    }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other      => throw new IllegalArgumentException(s"bad element type $other")
    }

  /** Σ aᵢ·bᵢ in one fused pass. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i)
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ${elemAccessor(left.dataType, a, i)} * ${elemAccessor(right.dataType, b, i)};
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** dot/(√(|a|²·|b|²)) in one fused three-accumulator pass. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = elemAt(left.dataType, x, i)
        val yv = elemAt(right.dataType, y, i)
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${elemAccessor(left.dataType, a, i)};
           |  double $yv = ${elemAccessor(right.dataType, b, i)};
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  // Column-level API. Spark 4's Column is connect-agnostic; the classic
  // bridge converts Column <-> catalyst Expression.
  import org.apache.spark.sql.graftbridge.ColumnBridge
  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ex(a), ex(b)))
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
}

/** Session extension registering the vector functions for SQL use:
  * `spark.sql("SELECT cosine_sim(a, b) ...")`. Wire with
  * `.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.plans.GraftExtensions` conf. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorExpressions.DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => VectorExpressions.CosineSimilarity(args(0), args(1))))
  }
}
