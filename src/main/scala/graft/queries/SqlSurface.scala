package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Roles, RolesSql, Tables}
import graft.functions.NormExprs.pround

/** The SQL-facing surface plus two temporal/range operators:
  *
  *  - `initViews` + `sql_rate_summary`: users of the reference talk to
  *    it in SQL (the webapp layer is all SQL over DuckDB views —
  *    webapp/utils/optimized_queries.py); `spark.sql` over the same
  *    role views is the drop-in equivalent, and the Catalyst plan is
  *    identical to the DataFrame form.
  *  - `asof_rate_lookup`: as-of join — for each code, the latest rate
  *    whose last_updated_on ≤ the as-of date. Composed from existing
  *    ops (filter + max_by keep-latest), per the extension ladder's
  *    rule (a): no custom operator needed when composition expresses
  *    the semantics with one partial-agg shuffle.
  *  - `range_band_join`: rate → benchmark band lookup by
  *    `rate BETWEEN lo AND hi`. The band table is bounded and
  *    broadcast, so the non-equi condition evaluates scan-side
  *    (BroadcastNestedLoopJoin) — the fact never shuffles; bands are
  *    non-overlapping so row multiplicity is 1.
  */
object SqlSurface extends QueryPack {

  private val R = s"WITH rates AS (${RolesSql.rates})"

  /** Register the role frames as temp views for ad-hoc spark.sql use.
    * Idempotent per (session, dir): a real SQL session registers its
    * views once, so repeated queries must not re-pay 11 relation
    * resolutions each (measured ~1.4 s of the sql_rate_summary time).
    * Re-registers when the data dir changes (tests run several SFs in
    * one session). Caveat of the skip: the views pin their file
    * listing — if the data UNDER an already-registered dir is
    * rewritten (compaction, regeneration), or a view name is dropped
    * externally, call with `force = true` to re-resolve. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  def initViews(spark: SparkSession, dir: String,
                force: Boolean = false): Unit = {
    if (!force && dir == registered.get(spark)) return
    Roles.rates(spark, dir).createOrReplaceTempView("rates")
    Roles.providers(spark, dir).createOrReplaceTempView("providers")
    Seq("part", "nation", "supplier", "orders", "customer", "lineitem",
      "events", "documents", "embeddings").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    registered.put(spark, dir)
  }

  def queries: Map[String, QFn] = Map(
    // the webapp's summary endpoint, expressed as literal SQL text
    "sql_rate_summary" -> ((s, d) => {
      initViews(s, d)
      s.sql("""
        SELECT billing_class, COUNT(*) AS rate_count,
               -- CAST to DOUBLE: Spark parses the 100.0 literal as
               -- DECIMAL(4,1) and bigint/decimal division yields
               -- DECIMAL(27,6); DuckDB yields DOUBLE. Without the cast
               -- the two sides render differently (53188.900000 vs
               -- 53188.9) and the driver's value hash diverges.
               CAST(floor((CAST(SUM(CAST(negotiated_rate AS DECIMAL(18,2)))
                      AS DOUBLE) / COUNT(negotiated_rate)) * 100.0 + 0.5)
                 / 100.0 AS DOUBLE) AS avg_rate,
               COUNT(DISTINCT billing_code) AS unique_codes
        FROM rates
        WHERE year_month BETWEEN '1995-01' AND '1995-12'
        GROUP BY billing_class
        ORDER BY billing_class""")
    }),

    // as-of join: latest rate per code effective at the as-of date
    "asof_rate_lookup" -> ((s, d) => {
      val asOf = "1995-06-30"
      Roles.rates(s, d)
        .filter(col("last_updated_on") <= asOf)
        .groupBy("billing_code")
        .agg(max(struct(col("last_updated_on"), col("l_orderkey"),
          col("l_linenumber"), col("negotiated_rate"))).as("top"))
        .select(col("billing_code"),
          date_format(col("top.last_updated_on"), "yyyy-MM-dd")
            .as("effective_date"),
          col("top.negotiated_rate").as("rate_asof"))
    }),

    // range join: rate → non-overlapping benchmark band (broadcast BNLJ)
    "range_band_join" -> ((s, d) => {
      val bands = s.range(0, 11).select(
        (col("id") * 10000).cast("double").as("lo"),
        ((col("id") + 1) * 10000).cast("double").as("hi"),
        concat(lit("band_"), col("id")).as("band"))
      val r = Roles.rates(s, d)
      r.join(broadcast(bands),
          r("negotiated_rate") >= col("lo") && r("negotiated_rate") < col("hi"),
          "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          pround(col("negotiated_rate"), 2).as("rate"), col("band"))
    })
  )

  def oracles: Map[String, String] = Map(
    "sql_rate_summary" -> s"""$R
      SELECT billing_class, COUNT(*) AS rate_count,
             CAST(floor((CAST(SUM(CAST(negotiated_rate AS DECIMAL(18,2)))
                    AS DOUBLE) / COUNT(negotiated_rate)) * 100.0 + 0.5)
               / 100.0 AS DOUBLE) AS avg_rate,
             COUNT(DISTINCT billing_code) AS unique_codes
      FROM rates
      WHERE year_month BETWEEN '1995-01' AND '1995-12'
      GROUP BY billing_class
      ORDER BY billing_class""",

    "asof_rate_lookup" -> s"""$R
      SELECT billing_code,
             strftime(last_updated_on, '%Y-%m-%d') AS effective_date,
             negotiated_rate AS rate_asof
      FROM (SELECT *, row_number() OVER (PARTITION BY billing_code
              ORDER BY last_updated_on DESC, l_orderkey DESC,
                       l_linenumber DESC, negotiated_rate DESC) AS rn
            FROM rates WHERE last_updated_on <= '1995-06-30')
      WHERE rn = 1""",

    "range_band_join" -> s"""$R
      SELECT l_orderkey, l_linenumber,
             floor((negotiated_rate) * 100.0 + 0.5) / 100.0 AS rate,
             b.band
      FROM rates LEFT JOIN (
        SELECT CAST(i * 10000 AS DOUBLE) AS lo,
               CAST((i + 1) * 10000 AS DOUBLE) AS hi,
               'band_' || CAST(i AS VARCHAR) AS band
        FROM range(0, 11) r(i)) b
      ON negotiated_rate >= b.lo AND negotiated_rate < b.hi"""
  )
}
