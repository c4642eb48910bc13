package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-level approximate-aggregation tier (SURVEY §2.4's policy,
  * applied as a plan rule instead of per-query rewrites).
  *
  * Off by default — every oracle-checked query runs exact. A session
  * that sets
  *
  *   spark.graft.approx.enabled=true
  *
  * gets every exact `percentile` swapped for `percentile_approx` (KLL
  * sketch, bounded state) at the same percentage expression: at 100 TB
  * a group's value set no longer fits an exact aggregation buffer, and
  * editing every dashboard query is the wrong layer to fix that —
  * the reference made the identical trade by materializing its
  * quantile profiles. Output schema is unchanged (double / array of
  * double), so dashboards cannot tell the tiers apart; accuracy is
  * governed by `spark.graft.approx.accuracy` (default 10000, ~±0.005
  * rank error).
  *
  * Only unweighted percentiles are rewritten: a weighted
  * `percentile(col, p, freq)` has no ApproximatePercentile
  * counterpart, and silently dropping the weights would be a
  * wrong-results bug, so those stay exact. `approx_count_distinct` is
  * NOT auto-swapped for `count(distinct)`: it changes long-typed exact
  * semantics that queries legitimately compare (upsert row counts),
  * so the distinct tier stays an explicit API choice
  * (`GoldAggregates.aggMarketRatesApprox`).
  */
case class ApproxTierRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.approx.enabled", "false").toBoolean
  private def accuracy: Int =
    spark.conf.get("spark.graft.approx.accuracy", "10000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(
          p: Percentile, _, _, _, _) if isUnweighted(p) =>
        ae.copy(aggregateFunction = new ApproximatePercentile(
          p.child, p.percentageExpression, Literal(accuracy)))
    }
  }

  private def isUnweighted(p: Percentile): Boolean =
    p.frequencyExpression match {
      case Literal(1L, _) => true
      case Literal(1, _) => true
      case _ => false
    }
}
