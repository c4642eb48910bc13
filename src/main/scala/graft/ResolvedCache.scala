package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed resolved-frame cache with a writer-generation invalidation
  * protocol — the serving-path primitive behind
  * [[graft.etl.GoldAggregates]]'s slice/sidecar caches and (r15) the
  * GenStore-backed index probes. Resolving a parquet frame — relation
  * resolution, file listing, footer/schema reads, and for an index its
  * committed-marker collect — costs tens to hundreds of ms per call,
  * and on a serving path that resolution (not the data) is most of the
  * request latency. The RESOLVED frame is immutable and reusable;
  * executions stay fresh reads of the listed files.
  *
  * The subtle parts, kept in one implementation so they stay in
  * lockstep everywhere:
  *  (a) the path's invalidation generation is captured BEFORE
  *      resolving, and the put is conditional on it being unchanged —
  *      a writer whose invalidate lands mid-resolution can never have
  *      its pre-rewrite file list re-inserted (the racing reader
  *      returns its frame uncached; one extra resolution next call,
  *      never a stale list);
  *  (b) stopped sessions' frames are purged under the lock so cycling
  *      sessions (notebook servers, test suites) cannot pin dead file
  *      indexes until LRU eviction;
  *  (c) LRU bound per cache.
  *
  * Writers MUST call [[invalidate]] with the path after any rewrite
  * under it — the same freshness contract as
  * [[graft.plans.GoldCatalog]].
  */
final class ResolvedCache[K <: AnyRef](
    max: Int, pathOf: K => String, sessionOf: K => SparkSession) {
  private val gen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[K, DataFrame]) = size() > max
    })
  def get(k: K)(resolve: => DataFrame): DataFrame = {
    val hit = cache.synchronized(cache.get(k))
    if (hit != null) hit
    else {
      val path = pathOf(k)
      val gen0: Long = gen.getOrDefault(path, 0L)
      val df = resolve
      cache.synchronized {
        val raced = cache.get(k)
        if (raced != null) raced
        else if (gen.getOrDefault(path, 0L).longValue != gen0) df
        else {
          cache.keySet().removeIf(
            (e: K) => sessionOf(e).sparkContext.isStopped)
          cache.put(k, df); df
        }
      }
    }
  }
  def invalidate(path: String): Unit = cache.synchronized {
    gen.merge(path, 1L,
      (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
    cache.keySet().removeIf((k: K) => pathOf(k) == path)
  }
}
