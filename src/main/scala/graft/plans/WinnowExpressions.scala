package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selection (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003): the per-document rightmost-min-of-every-w-window fingerprint
  * pass as ONE codegen'd scan expression.
  *
  * The relational formulation (k-gram hash explode → doc-keyed frame
  * min window → equi-join back on the min value with a w-wide position
  * band) is semantically exact and stays as the DuckDB oracle, but at
  * corpus scale it explodes ~one row per character and shuffles the
  * whole gram table twice — the suite's #1 steady cost (q_winnow_*
  * ≈ 15 s quiet combined, 150.8 MB of soak shuffle). This expression
  * computes the identical selections inside the scan stage with a
  * monotonic deque — O(len) amortized per document, zero exchanges —
  * so fingerprint selection becomes a map-only projection and the only
  * remaining shuffles are the ones the DOWNSTREAM operator needs
  * (df caps, pair joins).
  *
  * Exactness contract (the oracle replays every clause):
  *  - hash = fold (acc·131 + codepoint) mod 1000003 over each k-gram's
  *    codepoints, matching `ascii()` in both engines (Spark's `Ascii`
  *    reads the first CODEPOINT, as does DuckDB's over its 1-based
  *    character indexing);
  *  - per window of w consecutive gram hashes, select the RIGHTMOST
  *    minimum: the deque pops `>=` from the back, so among equal
  *    minima only the latest survives and the front is always the
  *    rightmost min of the live window;
  *  - selections are emitted once per distinct (pos, hash): the
  *    selected position is non-decreasing as the window slides (a
  *    selection leaves the window only from the left; a new gram wins
  *    only at a higher position), so consecutive-dedup IS full dedup —
  *    the relational DISTINCT collapses exactly the same repeats.
  *
  * Output: array<struct<fp_pos: long, fp: long>> of 1-based gram
  * positions; empty array (never null) for docs shorter than k+w−1 —
  * the caller's length filter makes that case unreachable, the guard
  * keeps the kernel total. */
object WinnowExpressions {

  private val outType = ArrayType(StructType(Seq(
    StructField("fp_pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  /** Winnowing kernel, callable from generated Java (`MODULE$`) so the
    * expression stays inside whole-stage codegen. */
  def computeWinnowFps(v: UTF8String, k: Int, w: Int): ArrayData = {
    val s = v.toString
    // codepoint walk: one hash input per Unicode codepoint, matching
    // ascii(split(text, '')[i]) / DuckDB ascii(text[i]) exactly
    val n = s.codePointCount(0, s.length)
    val m = n - k + 1 // gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](n)
    var si = 0
    var ci = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    // k-gram hashes: the direct O(k) fold per gram (k is small and the
    // mod-at-every-step order is the oracle's — a rolling update would
    // need modular inverses to stay value-identical)
    val h = new Array[Long](m)
    var j = 0
    while (j < m) {
      var acc = 0L
      var t = 0
      while (t < k) { acc = (acc * 131 + cps(j + t)) % 1000003; t += 1 }
      h(j) = acc
      j += 1
    }
    // monotonic deque of gram indices, h strictly increasing front to
    // back (>= pops enforce it), front = rightmost min of the window
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    var lastSel = -1
    val out = new java.util.ArrayList[Any](m / (w / 2 + 1) + 4)
    j = 0
    while (j < m) {
      while (tail > head && dq(head) < j - w + 1) head += 1
      while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (j >= w - 1) {
        val sel = dq(head)
        if (sel != lastSel) {
          out.add(new GenericInternalRow(
            Array[Any]((sel + 1).toLong, h(sel))))
          lastSel = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class WinnowFps(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = outType
    override def prettyName: String = "winnow_fps"

    override protected def nullSafeEval(v: Any): Any =
      computeWinnowFps(v.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.WinnowExpressions$$.MODULE$$" +
          s".computeWinnowFps($input, $k, $w);")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def winnow_fps(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WinnowFps(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k, w))
}
