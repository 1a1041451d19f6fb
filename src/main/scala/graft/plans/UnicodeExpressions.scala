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

  /** Mojibake repair kernel (the ftfy "UTF-8 read as Latin-1" case —
    * the single most common crawl-corpus encoding wound: 'café'
    * arriving as 'cafÃ©'). Strategy is all-or-nothing: if every char
    * fits Latin-1, reinterpret the chars as bytes and STRICT-decode as
    * UTF-8 — success means the string really was double-encoded (ASCII
    * passes through unchanged since ASCII is valid UTF-8), failure or
    * any char > 0xFF means it was genuine Latin-1/Unicode text and the
    * original is returned untouched. No heuristics, no partial fixes —
    * deterministic and conservative, so a false positive requires text
    * that is simultaneously valid high-byte UTF-8 byte-wise, which real
    * single-encoded Latin-1 prose essentially never is. */
  def computeFixMojibake(v: UTF8String): UTF8String = {
    val s = v.toString
    var needs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) {
        if (c > 0xFF) return v // real Unicode -> not latin1-mojibake
        needs = true
      }
      i += 1
    }
    if (!needs) return v // pure ASCII: decode would be identity
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => v }
  }

  case class FixMojibake(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "fix_mojibake"

    override protected def nullSafeEval(v: Any): Any =
      computeFixMojibake(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.UnicodeExpressions$$.MODULE$$.computeFixMojibake($input);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def fix_mojibake(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      FixMojibake(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))
}
