package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry of materialized gold aggregates for plan routing.
  *
  * Each entry maps the CANONICALIZED ANALYZED plan of a materialized
  * aggregate's defining query to the path it was written to. The
  * companion [[GoldRoutingRule]] swaps any analytically-identical plan
  * for a scan of the materialization — the exact-match tier of a
  * materialized-view rewrite, which is how the reference turns its
  * 2-5 s dashboard aggregations into 50-200 ms pre-agg reads
  * (webapp/DASHBOARD_OPTIMIZATION_GUIDE.md:9-19) without changing the
  * query code.
  *
  * Exact canonical equality is deliberately the ONLY match level: a
  * structural near-match (same grain, different predicate) silently
  * rewritten would be a wrong-results bug, the worst failure class an
  * optimizer rule can have. Containment rewrites (filter-above-MV)
  * still work for free — the filter node sits ABOVE the matched
  * subtree, so Catalyst prunes the gold scan's partitions after
  * routing.
  *
  * Freshness is the caller's contract, same as the reference's: a
  * registration asserts "this path holds the current result of this
  * query". Writers must re-register after refresh and `invalidate`
  * when the base data moves underneath.
  */
object GoldCatalog {

  final case class Entry(path: String, outputNames: Seq[String])

  /** Session conf that gates routing (default on). The gold writers
    * disable it around their own build — otherwise a slice refresh
    * would route its recompute to the very table it is refreshing and
    * read back stale data instead of the base tables. */
  val RoutingConfKey = "spark.graft.gold.routing"

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, Entry]()

  /** Analyzed scan plans per (session, path). A gold table holds one
    * leaf dir per (state, year_month) slice — thousands at scale — and
    * `spark.read.parquet` lists them all to build its FileIndex. Doing
    * that once per routed query would cost more than the routing saves
    * (measured: ~5 s/query at sf0.1 vs ~200 ms with the cache), so the
    * scan is built once and reused; every write path invalidates. */
  private val scanCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), LogicalPlan]()

  /** Cached analyzed scan of a registered materialization. */
  private[plans] def scanOf(spark: SparkSession, path: String): LogicalPlan =
    scanCache.computeIfAbsent((spark, path),
      _ => spark.read.parquet(path).queryExecution.analyzed)

  private def dropScans(path: String): Unit =
    scanCache.keySet().removeIf(k => k._2 == path)

  /** Register `path` as the materialization of `defining`. Call AFTER
    * the write completes, with the defining frame analyzed under
    * `withRoutingDisabled` (so the stored key is the raw plan, not an
    * already-routed one). */
  def register(defining: DataFrame, path: String): Unit = {
    dropScans(path) // the table was just (re)written; relist on next use
    entries.put(defining.queryExecution.analyzed.canonicalized,
      Entry(path, defining.columns.toSeq))
  }

  /** The table at `path` was rewritten in place (slice refresh):
    * existing registrations stay, but cached file listings must go. */
  def refreshed(path: String): Unit = dropScans(path)

  def lookup(plan: LogicalPlan): Option[Entry] =
    if (entries.isEmpty) None else Option(entries.get(plan.canonicalized))

  def isEmpty: Boolean = entries.isEmpty

  /** Drop every registration pointing at `path` (the materialization
    * was deleted or its base data changed). */
  def invalidate(path: String): Unit = {
    dropScans(path)
    entries.entrySet().removeIf(e => e.getValue.path == path)
  }

  /** Whether `path` currently backs any registration. */
  def isRegistered(path: String): Boolean =
    entries.values().stream().anyMatch(e => e.path == path)

  def clear(): Unit = { entries.clear(); scanCache.clear() }

  def routingEnabled(spark: SparkSession): Boolean =
    spark.conf.get(RoutingConfKey, "true").toBoolean

  /** Run `f` with routing off (restores the previous setting). */
  def withRoutingDisabled[T](spark: SparkSession)(f: => T): T = {
    val prev = spark.conf.get(RoutingConfKey, "true")
    spark.conf.set(RoutingConfKey, "false")
    try f finally spark.conf.set(RoutingConfKey, prev)
  }
}
