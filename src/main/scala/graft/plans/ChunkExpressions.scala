package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-gram scan kernels for the two remaining operators whose
  * per-document pass ran as interpreted higher-order lambdas — the
  * [[WinnowExpressions]] move applied twice more. Both keep their
  * RELATIONAL formulation as the DuckDB oracle, so the hash compare is
  * the equivalence proof each time.
  *
  * [[CdcChunks]]: content-defined chunking (Manber 1994) — the k-gram
  * polynomial hash (acc·131 + codepoint) mod 1000003, a boundary after
  * every gram whose hash ≡ 0 (mod m), chunks cut between consecutive
  * boundaries, empty chunks dropped. One compiled O(len·k) pass per
  * document instead of the interpreted transform/aggregate fold
  * (measured ~3 s of lambda time at sf0.1 before).
  *
  * [[PositionalQgramKeys]]: Ed-Join's occurrence-keyed positional
  * q-grams — the i-th copy of gram g becomes "g#i", turning the gram
  * multiset into a set. Previously this required a groupBy(id, g)
  * count + sequence explode: a full extra SHUFFLE of the gram table to
  * compute ordinals that are a per-document counter. One hash-map pass
  * inside the scan emits the keys directly; the corpus-level rarity
  * ordering and prefix join downstream stay relational (they genuinely
  * need corpus state).
  */
object ChunkExpressions {

  /** Shared codepoint walk: one hash input per Unicode codepoint
    * (matches `ascii(split(text, '')[i])` and DuckDB's 1-based
    * character indexing), plus each codepoint's java-char offset so
    * substrings cut on codepoint boundaries exactly like `substr`. */
  private def codepoints(s: String): (Array[Int], Array[Int]) = {
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    val off = new Array[Int](n + 1)
    var si = 0
    var ci = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp
      off(ci) = si
      ci += 1
      si += Character.charCount(cp)
    }
    off(n) = s.length
    (cps, off)
  }

  /** CDC kernel: array of NON-EMPTY chunk strings, boundaries after
    * every k-gram with hash % mod == 0 plus the text end. */
  def computeCdcChunks(v: UTF8String, k: Int, mod: Int): ArrayData = {
    val s = v.toString
    val (cps, off) = codepoints(s)
    val n = cps.length
    val out = new java.util.ArrayList[Any]()
    var prev = 0 // codepoint index of the current chunk start
    def cut(end: Int): Unit =
      if (end > prev) {
        out.add(UTF8String.fromString(s.substring(off(prev), off(end))))
        prev = end
      } else prev = end
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        var acc = 0L
        var t = 0
        while (t < k) { acc = (acc * 131 + cps(i + t)) % 1000003; t += 1 }
        if (acc % mod == 0) cut(i + k)
        i += 1
      }
    }
    cut(n)
    new GenericArrayData(out.toArray)
  }

  case class CdcChunks(child: Expression, k: Int, mod: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "cdc_chunks"

    override protected def nullSafeEval(v: Any): Any =
      computeCdcChunks(v.asInstanceOf[UTF8String], k, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.ChunkExpressions$$.MODULE$$" +
          s".computeCdcChunks($input, $k, $mod);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def cdc_chunks(text: Column, k: Int, mod: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CdcChunks(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        k, mod))

  /** Ed-Join keying kernel: positional q-grams with occurrence
    * ordinals — ["ab#1", "bc#1", "ab#2", ...] in position order. */
  def computeQgramKeys(v: UTF8String, q: Int): ArrayData = {
    val s = v.toString
    val (_, off) = codepoints(s)
    val n = off.length - 1
    if (n < q) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Int](n * 2)
    val out = new Array[Any](n - q + 1)
    var i = 0
    while (i <= n - q) {
      val g = s.substring(off(i), off(i + q))
      val c = counts.merge(g, 1, Integer.sum)
      out(i) = UTF8String.fromString(g + "#" + c)
      i += 1
    }
    new GenericArrayData(out)
  }

  case class PositionalQgramKeys(child: Expression, q: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "positional_qgram_keys"

    override protected def nullSafeEval(v: Any): Any =
      computeQgramKeys(v.asInstanceOf[UTF8String], q)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.ChunkExpressions$$.MODULE$$" +
          s".computeQgramKeys($input, $q);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def positional_qgram_keys(text: Column, q: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PositionalQgramKeys(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), q))
}
