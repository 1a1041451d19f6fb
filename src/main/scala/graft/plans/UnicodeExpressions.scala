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

  /** Numeric HTML character references (`&#NNN;` / `&#xNN;`) decoded
    * to their code points over the FULL Unicode range — BMP and astral
    * included. Spark's builtin `chr` is mod-256 above 0xFF, so a
    * builtin-composed decode had to stop at Latin-1 (and leave the
    * very common `&#8217;` curly quote as literal text); this native
    * kernel removes that cap while staying inside whole-stage codegen.
    *
    * Decoded forms are EXACTLY `&#` + 1-7 decimal digits + `;` or
    * `&#x`/`&#X` + 1-6 hex digits + `;`, with code point in
    * 1..0x10FFFF excluding the surrogate block — anything else
    * (unterminated, overlong, `&#0;`, `&#xD800;`, out of range) is
    * left as literal text, never mangled. Named entities are NOT
    * handled here: the caller's replace chain runs AFTER this kernel
    * (same `&amp;`-last discipline, so `&amp;#65;` still yields the
    * literal text `&#65;`). The fast path returns the input UTF8String
    * untouched when no `&#` occurs — at 100 TB, entity-free text pays
    * one memchr-style scan. The DuckDB oracle replays the decode with
    * a regexp tokenize + `chr()`, a genuine cross-implementation
    * check (different parser, same defined result). */
  def computeDecodeEntities(v: UTF8String): UTF8String = {
    // fast path on the RAW UTF-8 bytes: entity-free text (the vast
    // majority at corpus scale) must return without the toString
    // UTF-16 decode + allocation — '&' and '#' are ASCII, so the byte
    // pair 0x26 0x23 appears iff the text contains "&#"
    val bytes = v.getBytes
    var k = 0
    var found = false
    while (!found && k < bytes.length - 1) {
      if (bytes(k) == 0x26 && bytes(k + 1) == 0x23) found = true
      k += 1
    }
    if (!found) return v
    val s = v.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digitStart = j
        val maxDigits = if (hex) 6 else 7
        var value = 0L
        while (j < n && j - digitStart < maxDigits + 1 && {
          val d = s.charAt(j)
          if (hex) (d >= '0' && d <= '9') || (d >= 'a' && d <= 'f') || (d >= 'A' && d <= 'F')
          else d >= '0' && d <= '9'
        }) {
          val d = s.charAt(j)
          val dv =
            if (d <= '9') d - '0'
            else if (d <= 'F') d - 'A' + 10
            else d - 'a' + 10
          value = value * (if (hex) 16 else 10) + dv
          j += 1
        }
        val nDigits = j - digitStart
        if (nDigits >= 1 && nDigits <= maxDigits &&
            j < n && s.charAt(j) == ';' &&
            value >= 1 && value <= 0x10FFFF &&
            !(value >= 0xD800 && value <= 0xDFFF)) {
          sb.appendCodePoint(value.toInt)
          i = j + 1
          consumed = true
        }
      }
      if (!consumed) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "decode_html_entities"

    override protected def nullSafeEval(v: Any): Any =
      computeDecodeEntities(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.UnicodeExpressions$$.MODULE$$.computeDecodeEntities($input);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def decode_html_entities(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DecodeHtmlEntities(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))
}
