package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-word tokenizer kernels — the scan-kernel move applied to
  * the two subword encoders whose per-DISTINCT-word walk still ran as
  * interpreted higher-order folds probing a linear-scan map literal
  * ([[graft.operators.WordPiece]]'s greedy longest-match,
  * [[graft.operators.Unigram]]'s Viterbi DP). The distinct-word
  * re-plan (round 9) already made the walk run once per vocabulary
  * word rather than per occurrence; these kernels retire the
  * interpreted expression tree on top. The vocabulary rides the
  * expression as a reference object (hash lookups instead of the map
  * literal's linear scan), and both DuckDB oracles replay their
  * INDEPENDENT relational formulations unchanged — the hash compare
  * remains the cross-implementation proof.
  *
  * Exactness contracts mirrored from the fold formulations:
  *  - both walk CODEPOINT positions (`length`/`substr` semantics);
  *  - WordPiece: longest-match cascade maxPieceLen..1, "##" prefix on
  *    non-initial pieces, [UNK] for over-length or uncoverable words;
  *  - Unigram: DP cell = min over candidates of (prev + cost) with
  *    ties by LONGEST piece (the struct (cost, −l) ordering — doubles
  *    compared via java.lang.Double.compare, Spark's own struct
  *    ordering), dead cells at the 1e18 sentinel, the 1e17 [UNK]
  *    threshold, cost additions in the identical IEEE order. */
object TokenizerExpressions {

  private def codepointOffsets(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val off = new Array[Int](n + 1)
    var si = 0
    var ci = 0
    while (si < s.length) {
      off(ci) = si
      val cp = s.codePointAt(si)
      ci += 1
      si += Character.charCount(cp)
    }
    off(n) = s.length
    off
  }

  /** WordPiece greedy longest-match for ONE word. The vocab arrives as
    * a java HashSet (O(1) unboxed probes — the expression builds it
    * once from its literal parameter; a typedLit map probe is a linear
    * scan per lookup, which at a realistic 30k-piece vocabulary is the
    * difference between an encode pass and a non-starter). */
  def wordpieceGreedy(v: UTF8String, vocab: java.util.HashSet[String],
                      maxPieceLen: Int,
                      maxWordLen: Int, unk: UTF8String): ArrayData = {
    val s = v.toString
    val off = codepointOffsets(s)
    val n = off.length - 1
    val unkOut = new GenericArrayData(Array[Any](unk))
    if (n > maxWordLen) return unkOut
    val toks = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      var l = math.min(maxPieceLen, n - i)
      var hit = -1
      while (l >= 1 && hit < 0) {
        val piece =
          (if (i > 0) "##" else "") + s.substring(off(i), off(i + l))
        if (vocab.contains(piece)) hit = l else l -= 1
      }
      if (hit < 0) return unkOut
      toks.add(UTF8String.fromString(
        (if (i > 0) "##" else "") + s.substring(off(i), off(i + hit))))
      i += hit
    }
    new GenericArrayData(toks.toArray)
  }

  case class WordPieceEncode(child: Expression, vocab: Set[String],
                             maxPieceLen: Int, maxWordLen: Int, unk: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "wordpiece_greedy"
    private val unkU = UTF8String.fromString(unk)
    @transient private lazy val vset = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }

    override protected def nullSafeEval(v: Any): Any =
      wordpieceGreedy(v.asInstanceOf[UTF8String], vset, maxPieceLen,
        maxWordLen, unkU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vocabRef = ctx.addReferenceObj("wpVocab", vset,
        "java.util.HashSet")
      val unkRef = ctx.addReferenceObj("wpUnk", unkU,
        classOf[UTF8String].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.TokenizerExpressions$$.MODULE$$" +
          s".wordpieceGreedy($input, $vocabRef, $maxPieceLen, $maxWordLen, $unkRef);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def wordpiece_greedy(w: Column, vocab: Set[String], maxPieceLen: Int,
                       maxWordLen: Int, unk: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WordPieceEncode(org.apache.spark.sql.graftbridge.ColumnBridge.expression(w),
        vocab, maxPieceLen, maxWordLen, unk))

  private val viterbiType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("cost", DoubleType, nullable = false)))

  /** Unigram-LM Viterbi segmentation for ONE word:
    * (tokens, optimal cost). Costs arrive as a java HashMap (O(1)
    * probes, one unbox per hit — the WordPiece note on vocab-size
    * scaling applies verbatim). */
  def unigramViterbi(v: UTF8String, costs: java.util.HashMap[String, java.lang.Double],
                     maxPieceLen: Int, maxWordLen: Int,
                     unk: UTF8String): InternalRow = {
    val s = v.toString
    val off = codepointOffsets(s)
    val n = off.length - 1
    def unkRow = new GenericInternalRow(
      Array[Any](new GenericArrayData(Array[Any](unk)), 0.0))
    if (n > maxWordLen) return unkRow
    val cost = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      // the fold's struct-min over (cost, −l): smallest cost, then the
      // LONGEST piece on exact ties; doubles via Double.compare (the
      // struct ordering), dead cells at the 1e18 sentinel with back 1
      var bestC = 1.0e18
      var bestL = -1
      var l = 1
      while (l <= maxPieceLen && l <= j) {
        val c = costs.get(s.substring(off(j - l), off(j)))
        if (c != null) {
          val prev = if (j == l) 0.0 else cost(j - l)
          val cand = prev + c.doubleValue()
          val cmp = java.lang.Double.compare(cand, bestC)
          if (bestL < 0 || cmp < 0 || (cmp == 0 && l > bestL)) {
            bestC = cand
            bestL = l
          }
        }
        l += 1
      }
      cost(j) = bestC
      back(j) = if (bestL < 0) 1 else bestL
      j += 1
    }
    if (cost(n) >= 1.0e17) return unkRow
    val rev = new java.util.ArrayList[Any]()
    j = n
    while (j > 0) {
      val b = back(j)
      rev.add(UTF8String.fromString(s.substring(off(j - b), off(j))))
      j -= b
    }
    val out = new Array[Any](rev.size)
    var k = 0
    while (k < out.length) { out(k) = rev.get(out.length - 1 - k); k += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(out), cost(n)))
  }

  case class UnigramViterbi(child: Expression, costs: Map[String, Double],
                            maxPieceLen: Int, maxWordLen: Int, unk: String)
      extends UnaryExpression {
    override def dataType: DataType = viterbiType
    override def prettyName: String = "unigram_viterbi"
    private val unkU = UTF8String.fromString(unk)
    @transient private lazy val cmap = {
      val m = new java.util.HashMap[String, java.lang.Double](costs.size * 2)
      costs.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
      m
    }

    override protected def nullSafeEval(v: Any): Any =
      unigramViterbi(v.asInstanceOf[UTF8String], cmap, maxPieceLen,
        maxWordLen, unkU)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val costsRef = ctx.addReferenceObj("usCosts", cmap,
        "java.util.HashMap")
      val unkRef = ctx.addReferenceObj("usUnk", unkU,
        classOf[UTF8String].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.TokenizerExpressions$$.MODULE$$" +
          s".unigramViterbi($input, $costsRef, $maxPieceLen, $maxWordLen, $unkRef);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def unigram_viterbi(w: Column, costs: Map[String, Double], maxPieceLen: Int,
                      maxWordLen: Int, unk: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      UnigramViterbi(org.apache.spark.sql.graftbridge.ColumnBridge.expression(w),
        costs, maxPieceLen, maxWordLen, unk))

  /** One word through the BPE apply chain: codepoints joined by single
    * spaces, then each learned merge as a literal LEFT-TO-RIGHT
    * NON-OVERLAPPING string replace in training order —
    * java.lang.String.replace, the exact semantics of Spark's
    * `replace` that the fold formulation used and the SQL oracles
    * replay (including the known string-level quirk that a pair can
    * match across a symbol boundary when a symbol ENDS with the
    * pair's left half — faithful, because the oracle has it too). */
  private def bpeWordIds(word: String,
                         merges: Array[(String, String)],
                         vocab: java.util.HashMap[String, java.lang.Long])
      : Array[Any] = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var si = 0
    while (si < word.length) {
      val cp = word.codePointAt(si)
      if (sb.length > 0) sb.append(' ')
      sb.appendCodePoint(cp)
      si += Character.charCount(cp)
    }
    var sym = sb.toString
    var m = 0
    while (m < merges.length) {
      sym = sym.replace(merges(m)._1, merges(m)._2)
      m += 1
    }
    val toks = sym.split(" ", -1)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = vocab.get(toks(i)) // null id for OOV — loud, as before
      i += 1
    }
    out
  }

  /** Flat BPE id stream for a whole document (the [[bpeWordIds]] word
    * routine over the single-space word split, flattened). */
  def bpeIds(v: UTF8String, merges: Array[(String, String)],
             vocab: java.util.HashMap[String, java.lang.Long]): ArrayData = {
    val words = v.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val ids = bpeWordIds(words(i), merges, vocab)
        var j = 0
        while (j < ids.length) { out.add(ids(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Word-structured BPE ids: one inner array per word. */
  def bpeWordIdsDoc(v: UTF8String, merges: Array[(String, String)],
                    vocab: java.util.HashMap[String, java.lang.Long])
      : ArrayData = {
    val words = v.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        out.add(new GenericArrayData(bpeWordIds(words(i), merges, vocab)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  abstract class BpeEncodeBase extends UnaryExpression {
    def merges: Seq[(String, String)]
    def vocab: Seq[(String, Long)]
    @transient protected lazy val mergeArr: Array[(String, String)] =
      merges.toArray
    @transient protected lazy val vmap = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
      m
    }
  }

  case class BpeIds(child: Expression, merges: Seq[(String, String)],
                    vocab: Seq[(String, Long)]) extends BpeEncodeBase {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "bpe_ids"

    override protected def nullSafeEval(v: Any): Any =
      bpeIds(v.asInstanceOf[UTF8String], mergeArr, vmap)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
      val vRef = ctx.addReferenceObj("bpeVocab", vmap, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.TokenizerExpressions$$.MODULE$$" +
          s".bpeIds($input, $mRef, $vRef);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class BpeWordIds(child: Expression, merges: Seq[(String, String)],
                        vocab: Seq[(String, Long)]) extends BpeEncodeBase {
    override def dataType: DataType =
      ArrayType(ArrayType(LongType, containsNull = true), containsNull = false)
    override def prettyName: String = "bpe_word_ids"

    override protected def nullSafeEval(v: Any): Any =
      bpeWordIdsDoc(v.asInstanceOf[UTF8String], mergeArr, vmap)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "scala.Tuple2[]")
      val vRef = ctx.addReferenceObj("bpeVocab", vmap, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.TokenizerExpressions$$.MODULE$$" +
          s".bpeWordIdsDoc($input, $mRef, $vRef);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def bpe_ids(text: Column, merges: Seq[(String, String)],
              vocab: Seq[(String, Long)]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BpeIds(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        merges, vocab))

  def bpe_word_ids(text: Column, merges: Seq[(String, String)],
                   vocab: Seq[(String, Long)]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BpeWordIds(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        merges, vocab))
}
