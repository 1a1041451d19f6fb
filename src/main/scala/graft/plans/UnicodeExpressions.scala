package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus hygiene: crawl text mixes composed
  * (U+00E9 'é') and decomposed ('e' + U+0301) forms of the same
  * grapheme, which defeats exact dedup, shingling and stopword matches
  * — NFC-normalizing at ingest makes byte equality mean grapheme
  * equality. Spark has no builtin for this (`lower`/`translate` don't
  * touch combining marks); a native expression with a codegen kernel
  * keeps it inside whole-stage codegen, unlike a Scala UDF.
  *
  * The kernel fast-paths the common case: `Normalizer.isNormalized` is
  * a cheap scan (ASCII short-circuits via the Latin-1 quick-check) and
  * already-NFC input returns the SAME UTF8String with zero allocation —
  * at 100 TB, mostly-ASCII corpora pay ~nothing.
  */
object UnicodeExpressions {

  /** NFC kernel, callable from generated Java. */
  def computeNfc(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override protected def nullSafeEval(v: Any): Any =
      computeNfc(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.UnicodeExpressions$$.MODULE$$.computeNfc($input);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def nfc_normalize(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))
}
