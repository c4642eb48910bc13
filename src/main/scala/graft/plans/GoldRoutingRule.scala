package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analysis-time materialized-aggregate routing (extension ladder rung
  * (c): a `Rule[LogicalPlan]` shipped via [[graft.GraftExtensions]]).
  *
  * Any analyzed subtree that canonically equals a [[GoldCatalog]]
  * registration is replaced by a scan of its materialization,
  * column-mapped by name back onto the original output attributes
  * (same ExprIds, so parents resolve untouched). Running at post-hoc
  * resolution — not in the optimizer — keeps the match key stable
  * (optimizer batches like the distinct-aggregate expand rewrite would
  * otherwise mutate one side of the comparison) and lets the full
  * optimizer work on the routed plan: a dashboard filter above the
  * matched aggregate becomes a partition-pruned read of one gold
  * slice, which is the reference's entire serving-latency story.
  *
  * The rule rewrites only on EXACT canonical equality — see
  * [[GoldCatalog]] for why near-miss matching is excluded — so a
  * query that differs in any predicate, grouping, or expression runs
  * unrouted and correct.
  */
case class GoldRoutingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (GoldCatalog.isEmpty || !GoldCatalog.routingEnabled(spark)) plan
    else {
      // Class gate: only a subtree whose root class matches some
      // registered key's root class can possibly canonical-match, and
      // canonicalization (O(subtree), run per visited node) is the
      // rule's entire cost on the serving path — skip it everywhere
      // else.
      val classes = GoldCatalog.keyClasses
      plan.transformUp {
        case sub if sub.resolved && !sub.isInstanceOf[LeafNode] &&
            classes.contains(sub.getClass) =>
          GoldCatalog.lookup(sub) match {
            case Some(entry) => route(sub, entry).getOrElse(sub)
            case None => sub
          }
      }
    }
  }

  /** Build `Project(original attrs ← gold columns, scan(gold))`, or
    * None if the materialization no longer exposes every column (e.g.
    * deleted out from under the registry) — in which case the query
    * silently runs unrouted rather than failing. */
  private def route(sub: LogicalPlan,
                    entry: GoldCatalog.Entry): Option[LogicalPlan] = {
    // Fresh relation instance per use: the cached plan shares its
    // (expensive) FileIndex, but reusing its attribute ExprIds verbatim
    // would collide if one query routes two subtrees (self-join of the
    // same aggregate). newInstance() re-mints the output attributes.
    val scan = try {
      GoldCatalog.scanOf(spark, entry.path).transformUp {
        case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
          m.newInstance().asInstanceOf[LogicalPlan]
      }
    } catch { case _: Exception => return None }
    val byName = scan.output.map(a => a.name -> a).toMap
    if (!sub.output.forall(o => byName.contains(o.name))) return None
    val restored = sub.output.map { orig =>
      val src = byName(orig.name)
      val expr = if (src.dataType == orig.dataType) src
                 else Cast(src, orig.dataType)
      Alias(expr, orig.name)(exprId = orig.exprId)
    }
    Some(Project(restored, scan))
  }
}
