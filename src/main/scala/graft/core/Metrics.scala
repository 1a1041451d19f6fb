package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution instrumentation (reference O5: `time` around stages and
  * `.echo on` observability — `bin/fetcher.bash:19-22,68`): a
  * QueryExecutionListener that aggregates the physical plan's SQLMetrics
  * per query, keyed by an application-set label.
  *
  * "Measure, don't guess": Bench attaches this and reports shuffle
  * volume next to wall time, because a query that got faster by
  * shuffling 10x more data is not actually faster at 100 TB.
  */
final class MetricsListener extends QueryExecutionListener {

  final case class QueryMetrics(durationNs: Long, shuffleBytes: Long,
                                spillBytes: Long, outputRows: Long)

  private val byLabel = new ConcurrentHashMap[String, QueryMetrics]()
  @volatile private var currentLabel: String = "unlabeled"

  def label(name: String): Unit = { currentLabel = name }

  def get(name: String): Option[QueryMetrics] = Option(byLabel.get(name))

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wrappers hide the physical tree: AdaptiveSparkPlanExec can sit
    // anywhere below a write command, and materialized query stages are
    // LEAF nodes whose real subtree hangs off .plan — plain collect()
    // sees neither. Flatten through both.
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case s: QueryStageExec        => p +: flatten(s.plan)
      case _                        => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(qe.executedPlan)
    def sumMetric(names: Set[String]): Long =
      nodes.map(p =>
        p.metrics.collect { case (k, m) if names.contains(k) => m.value }.sum).sum
    val shuffle = sumMetric(Set("shuffleBytesWritten"))
    val spill = sumMetric(Set("spillSize"))
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    byLabel.merge(currentLabel, QueryMetrics(durationNs, shuffle, spill, rows),
      (a, b) => QueryMetrics(a.durationNs + b.durationNs,
        a.shuffleBytes + b.shuffleBytes, a.spillBytes + b.spillBytes,
        math.max(a.outputRows, b.outputRows)))
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
}
