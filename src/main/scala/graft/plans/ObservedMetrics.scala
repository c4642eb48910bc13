package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Reader for `Dataset.observe` metrics that survives adaptive
  * execution. `QueryExecution.observedMetrics` traverses the executed
  * plan with a collector that matches only `CollectMetricsExec` (and
  * cached relations) — but under AQE every materialized stage is
  * wrapped in a `QueryStageExec`, which is a LEAF node: a
  * CollectMetrics that sits below a shuffle (e.g. the hot-bucket-cap
  * telemetry riding a bucket-count aggregation that feeds a join)
  * ends up inside a stage leaf and the built-in traversal never sees
  * it, returning an empty map even though the accumulator holds the
  * metrics. This collector descends through `AdaptiveSparkPlanExec`
  * and `QueryStageExec` wrappers (and plan subqueries) explicitly.
  *
  * Usage: run an action on the observed frame first (the metrics
  * accumulate during execution), then `ObservedMetrics.of(df, name)`.
  */
object ObservedMetrics {

  def of(df: DataFrame, name: String): Option[Row] =
    find(df.queryExecution.executedPlan, name)

  private def find(plan: SparkPlan, name: String): Option[Row] = plan match {
    case c: CollectMetricsExec if c.name == name => Some(c.collectedMetrics)
    case a: AdaptiveSparkPlanExec => find(a.executedPlan, name)
    case s: QueryStageExec => find(s.plan, name)
    case other =>
      (other.children.iterator ++ other.subqueries.iterator)
        .flatMap(find(_, name)).nextOption()
  }
}
