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
  * pattern: `^p$` ≡ equality, `^p` ≡ startsWith, `p$` ≡ endsWith, bare
  * `p` ≡ contains. The payoff is not the regex engine cost — it is that
  * StartsWith/EqualTo/Contains are PUSHABLE data-source filters
  * (StringStartsWith etc.) while RLIKE never reaches the parquet
  * reader. The reference's include filters (F1, `bin/cfg.yaml:4-8`)
  * are mostly anchored literals (`_Statewide\.zip$`), so this turns
  * manifest/key filtering into scan-level pruning. Catalyst ships
  * LikeSimplification for LIKE; this is its RLIKE analog.
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
      if (pat.length >= 2 && pat.head == '^' && pat.last == '$' &&
          isLiteral(pat.substring(1, pat.length - 1)))
        EqualTo(child, lit(pat.substring(1, pat.length - 1)))
      else if (pat.nonEmpty && pat.head == '^' && isLiteral(pat.drop(1)))
        StartsWith(child, lit(pat.drop(1)))
      else if (pat.nonEmpty && pat.last == '$' && isLiteral(pat.dropRight(1)))
        EndsWith(child, lit(pat.dropRight(1)))
      else if (isLiteral(pat))
        Contains(child, lit(pat))
      else rl
  }
}
