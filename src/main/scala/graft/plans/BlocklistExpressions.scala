package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matching — the C4-family "bad words" gate
  * (Raffel et al. 2020 filter docs containing any phrase from a
  * dictionary) at crawl scale.
  *
  * The scale problem: a dictionary of thousands of phrases probed with
  * `contains()` costs |dictionary| passes over every document — at
  * 100 TB that multiplier is the whole bill. An Aho-Corasick automaton
  * matches ALL patterns in ONE pass over the text: O(chars + matches)
  * regardless of dictionary size. The automaton is built once from the
  * pattern literals (bounded model state — trie nodes ≤ total pattern
  * chars) and rides into generated code as a reference object, exactly
  * like the Bloom prefilter's sketch.
  *
  * Semantics (pinned, oracle-checked): total number of occurrences of
  * dictionary patterns in the text, counting EVERY match position —
  * overlapping matches count ('aba' twice in "ababa") and patterns
  * that are suffixes of other patterns both fire ('he' and 'she' both
  * hit on "she"), i.e. the sum over patterns of all substring
  * positions. Case-sensitive; callers `lower()` first. Matching is
  * Java-char exact — dictionary entries are expected to be BMP text
  * (blocklists are), where char counting agrees with the oracle's
  * code-point substr.
  */
object BlocklistExpressions {

  /** Immutable Aho-Corasick automaton. Arrays-of-maps representation:
    * built once at plan construction, serialized into the task binary
    * with the expression, shared by every row of the scan. */
  final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
    private val trans = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    private val endsHere = scala.collection.mutable.ArrayBuffer(0)

    patterns.foreach { p =>
      require(p.nonEmpty, "empty blocklist pattern")
      var node = 0
      p.foreach { c =>
        val next = trans(node).get(c)
        if (next != null) node = next.intValue()
        else {
          trans += new java.util.HashMap[Character, Integer]()
          endsHere += 0
          trans(node).put(c, trans.size - 1)
          node = trans.size - 1
        }
      }
      endsHere(node) += 1
    }

    private val fail = new Array[Int](trans.size)
    private val out = new Array[Int](trans.size)
    locally { // BFS fail links; out accumulates through suffix links
      val queue = new java.util.ArrayDeque[Integer]()
      out(0) = endsHere(0)
      trans(0).forEach { (_, child) =>
        fail(child) = 0
        out(child.intValue()) = endsHere(child.intValue())
        queue.add(child)
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        trans(u).forEach { (c, child) =>
          var f = fail(u)
          while (f != 0 && !trans(f).containsKey(c)) f = fail(f)
          val fc = trans(f).get(c)
          fail(child.intValue()) =
            if (fc != null && fc.intValue() != child.intValue()) fc.intValue() else 0
          out(child.intValue()) =
            endsHere(child.intValue()) + out(fail(child.intValue()))
          queue.add(child)
        }
      }
    }

    /** Total dictionary matches in `text` (all end positions). */
    def countMatches(text: UTF8String): Long = {
      val s = text.toString
      var state = 0
      var total = 0L
      var i = 0
      while (i < s.length) {
        val c = Character.valueOf(s.charAt(i))
        var st = state
        while (st != 0 && !trans(st).containsKey(c)) st = fail(st)
        val nxt = trans(st).get(c)
        state = if (nxt != null) nxt.intValue() else 0
        total += out(state)
        i += 1
      }
      total
    }
  }

  case class BlocklistHits(child: Expression, automaton: AhoCorasick)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "blocklist_hits"

    override protected def nullSafeEval(v: Any): Any =
      automaton.countMatches(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ac = ctx.addReferenceObj("acAutomaton", automaton,
        classOf[AhoCorasick].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = $ac.countMatches($input);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** `blocklist_hits(text, dictionary)`: one automaton instance per
    * call site, all patterns matched in one codegen'd pass. */
  def blocklist_hits(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BlocklistHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        new AhoCorasick(patterns)))
}
