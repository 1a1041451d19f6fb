package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: simplify anchored LITERAL regexes in RLIKE to plain
  * string predicates.
  *
  * Spark's RLIKE is a partial-match search, so for a metacharacter-free
  * pattern: `^p` ≡ startsWith and bare `p` ≡ contains. The payoff is not
  * the regex engine cost — it is that StartsWith/Contains are PUSHABLE
  * data-source filters (StringStartsWith etc.) while RLIKE never
  * reaches the parquet reader. The reference's include filters (F1,
  * `bin/cfg.yaml:4-8`) are anchored prefixes and literals, so this
  * turns manifest/key filtering into scan-level pruning. Catalyst
  * ships LikeSimplification for LIKE; this is its RLIKE analog.
  *
  * `$`-anchored patterns are deliberately NOT rewritten: java.util.regex
  * `$` (without UNIX_LINES/MULTILINE) also matches just before a FINAL
  * line terminator - any of \n, \r\n, \r, U+0085, U+2028, U+2029 - so
  * `x RLIKE 'p$'` is true for "p\n" while EndsWith(p)
  * (and EqualTo for `^p$`) would be false; an equivalence-preserving
  * rewrite needs a 7-way OR over terminator suffixes, which defeats
  * the single-pushable-predicate point.
  *
  * Conservative: any pattern containing a regex metacharacter
  * (including escapes) is left untouched.
  */
object RegexAnchorSimplification extends Rule[LogicalPlan] {

  private val meta = Set('\\', '.', '[', ']', '{', '}', '(', ')', '*', '+',
    '?', '|', '^', '$')

  private def isLiteral(s: String): Boolean = s.nonEmpty && !s.exists(meta)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case rl @ RLike(child, Literal(p: UTF8String, StringType)) =>
      val pat = p.toString
      def lit(s: String) = Literal(UTF8String.fromString(s), StringType)
      if (pat.nonEmpty && pat.head == '^' && isLiteral(pat.drop(1)))
        StartsWith(child, lit(pat.drop(1)))
      else if (isLiteral(pat))
        Contains(child, lit(pat))
      else rl
  }
}
