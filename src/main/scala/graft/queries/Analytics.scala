package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Roles, RolesSql, Tables}
import graft.functions.NormExprs._

/** The remaining SURVEY.md §2 inventory: webapp-style analytic
  * aggregates (A1-A3, A9, A10, A13), search/filter functions (F8, F9),
  * query-time computed-key joins (J9), the 5-way star join (J10), the
  * code-list file source (S5), the benchmark-builder cross product, and
  * autocomplete distinct (§2.6).
  *
  * Scale notes: only bounded dims (nation, supplier-as-dim, the 25-row
  * states side of the benchmark cross product) carry broadcast hints;
  * SF-scaled tables (orders, customer) go through shuffle joins so the
  * plans survive a 100× scale-up (AQE may still localize them at small
  * SF). Distinct counts are exact (matching the reference — SURVEY
  * §2.4) with a hybrid plan: countDistinct's expand+partial-distinct
  * for unbounded id columns, collect_set sizes for bounded-domain
  * descriptors so the Expand multiplier stays at the unbounded count.
  */
object Analytics extends QueryPack {

  private def rates(s: SparkSession, d: String) = Roles.rates(s, d)

  private val R = s"WITH rates AS (${RolesSql.rates})"

  private def avg2(c: Column) =
    pround(sum(c.cast("decimal(18,2)")).cast("double") / count(c), 2)

  /** DuckDB twin of [[graft.operators.Sketches.histBuckets]] +
    * [[graft.operators.Sketches.histQuantilesAt]] as a reusable CTE
    * chain: from source CTE `src` (carrying `key` and value expr `v`),
    * emits `{p}hv → {p}oct → {p}hist → {p}cum → {p}pick → {p}q`, where
    * `{p}q` holds `key` plus one UNROUNDED bucket-rep double per
    * requested (quantile, name). Bucket math is the verbatim integer
    * recipe the sketch_hist_quantiles oracle already pins. */
  private def histCteSql(src: String, key: String, v: String,
                         picks: Seq[(String, String)], p: String): String = {
    def rep2(n: String) =
      s"""(CASE WHEN ($n >> 3) <= 3 THEN ($n & 7) * 2
           ELSE (8 + ($n & 7)) *
                  (CAST(1 AS BIGINT) << CAST(($n >> 3) - 4 AS INTEGER)) * 2
                + (CAST(1 AS BIGINT) << CAST(($n >> 3) - 4 AS INTEGER))
           END)"""
    val pickCols = picks.map { case (q, n) =>
      s"""MIN(CASE WHEN CAST(cum AS DOUBLE) >=
            $q * CAST(total AS DOUBLE) THEN bucket END) AS b_$n"""
    }.mkString(",\n               ")
    val repCols = picks.map { case (_, n) =>
      s"CAST(${rep2(s"b_$n")} AS DOUBLE) / 200.0 AS $n"
    }.mkString(",\n               ")
    s"""${p}hv AS (
        SELECT $key,
               greatest(CAST(floor(($v) * 100.0 + 0.5) AS BIGINT), 1) AS hv
        FROM $src),
      ${p}oct AS (SELECT $key, hv, length(bin(hv)) AS ho FROM ${p}hv),
      ${p}hist AS (
        SELECT $key,
               ho * 8 + ((hv >> (CASE WHEN ho - 4 > 0 THEN ho - 4 ELSE 0 END))
                 & 7) AS bucket,
               COUNT(*) AS cnt
        FROM ${p}oct GROUP BY 1, 2),
      ${p}cum AS (
        SELECT $key, bucket,
               SUM(cnt) OVER (PARTITION BY $key ORDER BY bucket) AS cum,
               SUM(cnt) OVER (PARTITION BY $key) AS total
        FROM ${p}hist),
      ${p}pick AS (
        SELECT $key, $pickCols
        FROM ${p}cum GROUP BY 1),
      ${p}q AS (SELECT $key, $repCols FROM ${p}pick)"""
  }
  private def prS(e: String, scale: Int = 2): String = {
    val f = math.pow(10, scale)
    s"floor(($e) * $f + 0.5) / $f"
  }
  private def avgS(x: String): String =
    prS(s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)")

  /** Fixture code list (SURVEY §2.1 S5; cpt_codes.txt with blank lines,
    * main.py:194-203). Read driver-side, broadcast as an IN-set — the
    * reference's exact pattern. */
  private val CodeListPath = "/root/repo/tools/cpt_codes.txt"

  def queries: Map[String, QFn] = Map(
    // S5: text-file code list → broadcast IN-set filter (main.py:194-203)
    "s5_codelist_filter" -> ((s, d) => {
      val codes = s.read.textFile(CodeListPath).collect()
        .map(_.trim).filter(_.nonEmpty).toSeq
      rates(s, d).filter(col("billing_code").isin(codes: _*))
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")
    }),

    // A1: filtered group-mean (state wage index; rate_calculator.py:95-117)
    "a1_state_group_mean" -> ((s, d) =>
      Roles.providers(s, d).filter(col("s_acctbal") > 0)
        .groupBy("state")
        .agg(avg2(col("s_acctbal")).as("state_wi_avg"),
          count(lit(1)).as("n_rows"))),

    // A2: regex-extracted key + multi-column group means
    // (build_medicare_benchmarks.py:432-449)
    "a2_regex_key_group_mean" -> ((s, d) =>
      Tables.load(s, d, "part")
        .groupBy(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"))
        .agg(avg2(col("p_retailprice")).as("avg_work"),
          avg2(col("p_size")).as("avg_pe"),
          avg2((col("p_partkey") % 100)).as("avg_mp"))),

    // A3: national scalar means (build_medicare_benchmarks.py:316-319)
    "a3_national_mean" -> ((s, d) =>
      Tables.load(s, d, "part").agg(
        avg2(col("p_retailprice")).as("nat_work"),
        avg2(col("p_size")).as("nat_pe"),
        avg2((col("p_partkey") % 100)).as("nat_mp"))),

    // A9: category explore + drill-down paging (optimized_queries.py:828-899)
    "a9_category_drilldown" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      // customer is SF-scaled — no broadcast hint; AQE picks the join
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("record_count"),
          // hybrid per the a10 rule: expand only for the unbounded key
          countDistinct("o_custkey").as("unique_customers"),
          size(collect_set(col("o_orderpriority"))).cast("long")
            .as("unique_priorities"),
          avg2(col("o_totalprice")).as("avg_price"),
          pround(min(col("o_totalprice")), 2).as("min_price"),
          pround(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("record_count").desc, col("c_mktsegment"))
        .offset(1).limit(3)
    }),

    // A10: wide distinct-count pass over the star join
    // (optimized_queries.py:798-826)
    "a10_search_stats" -> ((s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      val sup = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation")
      // orders/customer are SF-scaled: shuffle-join them (AQE may still
      // localize at small SF); broadcast only the bounded dims.
      // Hybrid distinct strategy: countDistinct (expand + map-side
      // partial distinct — the scale-safe shape for unbounded keys)
      // only for the three high-cardinality ids; the five bounded-
      // domain descriptors as collect_set sizes, which ride the same
      // aggregation without multiplying the Expand. ×9 → ×4 on the
      // aggregation input.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"), "left")
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "left")
        .agg(count(lit(1)).as("total_rows"),
          countDistinct("l_partkey").as("unique_codes"),
          countDistinct("l_suppkey").as("unique_providers"),
          countDistinct("o_custkey").as("unique_customers"),
          size(collect_set(col("c_mktsegment"))).cast("long")
            .as("unique_segments"),
          size(collect_set(col("n_name"))).cast("long").as("unique_states"),
          size(collect_set(col("o_orderpriority"))).cast("long")
            .as("unique_priorities"),
          size(collect_set(col("l_returnflag"))).cast("long")
            .as("unique_flags"),
          size(collect_set(col("l_linestatus"))).cast("long")
            .as("unique_modes"))
    }),

    // A13 + F8 + F9: ILIKE over synthesized search text, grouped stats
    // (optimized_queries.py:265-457, 66-75)
    "a13_search_grouped" -> ((s, d) => {
      val sup = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation")
      val joined = sup.join(broadcast(n),
        sup("s_nationkey") === n("n_nationkey"), "left")
      val searchText = lower(concat_ws(" ",
        coalesce(col("s_name"), lit("")), coalesce(col("n_name"), lit(""))))
      joined.filter(searchText.contains("e"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_providers"),
          avg2(col("s_acctbal")).as("avg_bal"),
          pround(min(col("s_acctbal")), 2).as("min_bal"),
          pround(max(col("s_acctbal")), 2).as("max_bal"))
        .orderBy(col("n_providers").desc, col("n_name"))
    }),

    // J9: equi-join on a query-time computed slug key
    // (data_queries.py:303-332)
    "j9_computed_slug_join" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
        .select(slugify(col("c_name")).as("cust_slug"),
          col("c_mktsegment"), col("c_acctbal"))
      val oKeyed = o.select(col("o_orderkey"), col("o_totalprice"),
        concat(lit("customer_"),
          lpad(col("o_custkey").cast("string"), 9, "0")).as("cust_slug"))
      // customer is SF-scaled — plain shuffle join on the computed slug
      oKeyed.join(c, Seq("cust_slug"), "left")
        .select(col("o_orderkey"), col("cust_slug"), col("c_mktsegment"),
          pround(col("o_totalprice"), 2).as("total_price"))
    }),

    // J10: 5-way star join with a join-side predicate
    // (optimized_queries.py:653-689)
    "j10_five_way_star" -> ((s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      val sup = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation").filter(col("n_regionkey") === 1)
      // orders/customer are SF-scaled: no broadcast hint on them
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"), "left")
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("c_name"),
          col("s_name"), col("n_name").as("state"),
          col("o_orderpriority"), pround(col("l_extendedprice"), 2).as("rate"))
    }),

    // BenchmarkBuilder: state × code cross product + rate formula
    // (build_medicare_benchmarks.py:122-281; F10 main.py:495-510)
    "bench_crossjoin_build" -> ((s, d) => {
      val states = Tables.load(s, d, "nation").select(col("n_name").as("state"),
        (col("n_nationkey") % 10 / lit(10.0) + 0.8).as("work_gpci"),
        (col("n_nationkey") % 7 / lit(10.0) + 0.9).as("pe_gpci"),
        (col("n_nationkey") % 5 / lit(10.0) + 0.5).as("mp_gpci"))
      val codes = Tables.load(s, d, "part").select(
        col("p_partkey").cast("string").as("code"),
        (col("p_retailprice") / 100.0).as("work_rvu"),
        (col("p_size") / 10.0).as("pe_rvu"),
        (col("p_partkey") % 13 / lit(100.0)).as("mp_rvu"))
      // Broadcast the 25-row states side and stream the SF-scaled codes
      // table through BroadcastNestedLoopJoin — never the reverse.
      codes.crossJoin(broadcast(states))
        .select(col("state"), col("code"),
          pround(medicareProfRate(col("work_rvu"), col("pe_rvu"), col("mp_rvu"),
            col("work_gpci"), col("pe_gpci"), col("mp_gpci"),
            lit(32.35)), 2).as("medicare_prof_rate"))
    }),

    // The RateCalculator's full locality resolution chain
    // (src/transformers/rate_calculator.py:174-220): UNIQUE zip/code
    // pairs (the reference dedups before rating — P9 applied) walk
    // zip → (carrier, locality) → fee-schedule area → the GPCI triple
    // → the code's RVU triple, then the professional-rate formula at
    // the national conversion factor. Every lookup is a bounded dim
    // on the build side (locality geography and the RVU table don't
    // grow with claims volume), so the SF-scaled pair stream takes
    // four broadcast hash joins and never shuffles; nulls at any hop
    // zero-fill in the formula exactly like the reference's
    // row.get(..., 0).
    "medicare_locality_chain" -> ((s, d) => {
      def zipOf(k: Column) =
        lpad(((k * 7) % 100000).cast("string"), 5, "0")
      val pairs = Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(zipOf(col("l_suppkey")).as("zip_code"),
          col("l_partkey").cast("string").as("procedure_code"))
        .distinct()
      val localityMap = Tables.load(s, d, "supplier")
        .select(zipOf(col("s_suppkey")).as("zip_code"),
          concat(lit("MAC"), (col("s_suppkey") % 5).cast("string"))
            .as("carrier_code"),
          (col("s_suppkey") % 8).cast("int").as("locality_code"))
        .distinct()
      val meta = Tables.load(s, d, "nation")
        .select(concat(lit("MAC"), (col("n_nationkey") % 5).cast("string"))
          .as("mac_code"))
        .distinct()
        .select(col("mac_code"),
          explode(sequence(lit(0), lit(7))).as("m_loc"))
        .select(col("mac_code"), col("m_loc"),
          concat(lit("FSA_"), col("mac_code"), lit("_"),
            col("m_loc").cast("string")).as("fee_schedule_area"))
      val gpci = meta.select(
        col("fee_schedule_area").as("locality_name"),
        col("m_loc").as("g_loc"),
        (col("m_loc") / lit(10.0) + 0.8).as("work_gpci"),
        (col("m_loc") % 3 / lit(10.0) + 0.9).as("pe_gpci"),
        (col("m_loc") % 5 / lit(10.0) + 0.5).as("mp_gpci"))
      val rvu = Tables.load(s, d, "part").select(
        col("p_partkey").cast("string").as("procedure_code"),
        (col("p_retailprice") / 100.0).as("work_rvu"),
        (col("p_size") / 10.0).as("practice_expense_rvu"),
        (col("p_partkey") % 13 / lit(100.0)).as("malpractice_rvu"))
      pairs
        .join(broadcast(localityMap), Seq("zip_code"), "left")
        .join(broadcast(meta),
          col("carrier_code") === col("mac_code") &&
            col("locality_code") === col("m_loc"), "left")
        .join(broadcast(gpci),
          col("fee_schedule_area") === col("locality_name") &&
            col("locality_code") === col("g_loc"), "left")
        .join(broadcast(rvu), Seq("procedure_code"), "left")
        .select(col("zip_code"), col("procedure_code"),
          col("carrier_code"), col("locality_code"),
          col("fee_schedule_area"),
          pround(medicareProfRate(col("work_rvu"),
            col("practice_expense_rvu"), col("malpractice_rvu"),
            col("work_gpci"), col("pe_gpci"), col("mp_gpci"),
            lit(32.74)), 2).as("medicare_prof"))
    }),

    // §2.6: autocomplete — alphabetical distinct with prefix filter
    // (backend/main.py:804-888)
    "autocomplete_distinct" -> ((s, d) =>
      Tables.load(s, d, "part")
        .filter(lower(col("p_name")).startsWith("bl"))
        .select(col("p_name")).distinct()
        .orderBy("p_name").limit(20)),

    // P1+P2: guarded rename map + drop list (main.py:225-262) — rename
    // only columns that exist, drop ignoring missing
    "p1_p2_rename_drop" -> ((s, d) => {
      val renames = Map("l_extendedprice" -> "rate", "l_partkey" -> "code",
        "not_present" -> "ghost")
      val drops = Seq("l_discount", "l_tax", "also_not_present")
      val df = Tables.load(s, d, "lineitem")
      val present = renames.filter { case (k, _) => df.columns.contains(k) }
      df.withColumnsRenamed(present).drop(drops: _*)
        .select("l_orderkey", "l_linenumber", "code", "rate")
    }),

    // P11: required-fields row filter via na.drop (data_cleaner.py:66-77)
    "p11_required_fields" -> ((s, d) =>
      rates(s, d).na.drop(Seq("billing_code", "expiration_date", "payer_slug"))
        .select("l_orderkey", "l_linenumber", "billing_code", "expiration_date")),

    // S7: CMS reference-table load shape — year filter plus
    // null-or-empty modifier (rate_calculator.py:23-50)
    "s7_year_modifier_filter" -> ((s, d) => {
      val withMod = Tables.load(s, d, "orders")
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("modifier",
          when(col("o_orderkey") % 5 === 0, "26")
            .when(col("o_orderkey") % 5 === 1, "")
            .otherwise(lit(null).cast("string")))
      withMod.filter(col("year") === 1995 &&
          (col("modifier").isNull || col("modifier") === ""))
        .select("o_orderkey", "o_totalprice", "modifier")
    }),

    // J6: scalar map-lookup join (Series.map; main.py:747)
    "j6_scalar_map_join" -> ((s, d) => {
      val wi = Tables.load(s, d, "nation")
        .select(col("n_name").as("state"),
          pround(col("n_nationkey") / lit(25.0) + 0.7, 4).as("state_wi_avg"))
      val p = Roles.providers(s, d)
      p.join(broadcast(wi), Seq("state"), "left")
        .select(col("provider_group_id"), col("state"), col("state_wi_avg"))
    }),

    // J14: conditional plan building via the param grammar (QueryApi;
    // backend/main.py:117-125) — provider join attached only because a
    // provider-side filter (state) is present
    "j14_conditional_join" -> ((s, d) =>
      QueryApi.rateSummary(s, d, QueryApi.RateFilter(
        state = "NATION_9", yearMonth = "1995-09",
        billingClass = Some("professional"), minRate = Some(100.0)))),

    // Rolling-frame window features over the event stream — the
    // feature-engineering shape (lag + sliding count/sum per entity)
    // the W1/W2 keep-latest windows don't cover. Scale: ONE exchange
    // on user_id and a bounded per-user sort; every frame is ROWS-
    // bounded so WindowExec streams without buffering whole
    // partitions. The sliding sum is computed over exact integer
    // cents (floor(value·100 + 0.5) as BIGINT) because engines
    // disagree on fp window-sum association (segment trees vs frame
    // rescans) — integer arithmetic is order-free, so the oracle can
    // hash-match. `ts` stays an ordering key only (with event_id as
    // tiebreak), never an output, sidestepping the dual timestamp
    // encodings of events.parquet.
    "events_rolling_features" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-3, -1)
      Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value"))
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("seq"),
          lag(col("value"), 1).over(w).as("prev_value"),
          count(lit(1)).over(frame).as("recent_cnt"),
          coalesce(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .over(frame), lit(0L)).as("recent_sum_cents"))
    }),

    // Temporal interval join (the Flink-interval-join class, distinct
    // from as-of and static range-band joins): per click, the
    // purchases by the same user inside the following 30 minutes.
    // Spark-first shape — NOT an inequality join (which Catalyst can
    // only run as a nested loop): each click explodes into its two
    // covering 30-minute time bins, the join is a pure (user, bin)
    // EQUI-join that hashes and shuffles like any other, and the
    // actual interval predicate refines the co-binned candidates.
    // Work is bounded by co-bin density (events per user per window),
    // never by per-user cross products; the 2× click duplication is
    // the entire overhead.
    "events_interval_join" -> ((s, d) => {
      val gapUs = 30L * 60 * 1000000
      // through eventFeed, NOT a raw ts cast: events.parquet ships in
      // two encodings (int64 epoch-nanos and TIMESTAMP_MICROS), and
      // only the feed's dispatch decodes both correctly
      val e = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("event_time")).as("us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("cus"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("pus"),
          floor(col("us") / gapUs).cast("long").as("bin"))
      val matched = clicks
        .withColumn("b0", floor(col("cus") / gapUs).cast("long"))
        .withColumn("bin", explode(array(col("b0"), col("b0") + 1)))
        .join(purchases, Seq("user_id", "bin"))
        .filter(col("pus") >= col("cus") && col("pus") < col("cus") + gapUs)
        .groupBy("click_id")
        .agg(count(lit(1)).as("n"), min(col("pus") - col("cus")).as("lag"))
      clicks.join(matched, Seq("click_id"), "left")
        .select(col("click_id"),
          coalesce(col("n"), lit(0L)).as("n_purchases_30m"),
          col("lag").as("min_lag_us"))
    }),

    // SCD2 historization: compress an event log into a type-2 slowly-
    // changing dimension — per entity, one row per STATE CHANGE with
    // [valid_from, valid_to) and a current flag. Extends the dim
    // toolkit past W1's keep-latest (SCD1): lag to detect changes,
    // lead over the surviving change rows to close each interval.
    // Both windows share the (user_id) partitioning, so the log
    // shuffles once; the lead pass re-sorts only the (rare) change
    // rows. Timestamps render as strings per the house convention.
    "scd2_user_history" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("event_time"), col("event_id"))
      // eventFeed for the dual-encoding dispatch (see the interval
      // join above); event_time is already a proper timestamp here
      val changes = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
        .select(col("user_id"), col("event_type"), col("event_time"),
          col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("event_type") =!= col("prev"))
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      changes
        .withColumn("valid_to_ts", lead(col("event_time"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          date_format(col("event_time"), fmt).as("valid_from"),
          date_format(col("valid_to_ts"), fmt).as("valid_to"),
          when(col("valid_to_ts").isNull, 1).otherwise(0).as("is_current"))
    }),

    // Gap-based sessionization, the BATCH twin of the streaming
    // flatMapGroupsWithState path (StreamingSpec pins the two equal) —
    // declared here so the window-function formulation is ALSO
    // DuckDB-oracled. Timestamps render as strings (the
    // f16_datetime_coerce convention) so engine timestamp-type
    // plumbing can't fake a mismatch.
    "events_sessionize" -> ((s, d) => {
      val feed = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
      graft.streaming.StreamOps.sessionizeBatch(feed, gapMs = 30L * 60 * 1000)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_end"),
          col("n_events"))
    }),

    // Session-grain rollup of the gaps-and-islands sessionizer — the
    // engagement summary a product dashboard reads (how many
    // sessions, how deep, how long): count / single-event share /
    // exact p50 duration over sessionizeBatch's output. One extra
    // aggregate over the already-oracled session frame; durations in
    // seconds via the µs-exact unix_micros convention.
    "events_session_stats" -> ((s, d) => {
      val sess = graft.streaming.StreamOps.sessionizeBatch(
        graft.streaming.StreamingUpsert
          .eventFeed(Tables.load(s, d, "events")),
        gapMs = 30L * 60 * 1000)
        .select(col("n_events"),
          ((unix_micros(col("session_end")) -
            unix_micros(col("session_start"))) / lit(1000000.0))
            .as("dur_s"))
      sess.agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_single"),
        pround(avg(col("n_events")), 4).as("avg_events"),
        max(col("n_events")).as("max_events"),
        pround(avg(col("dur_s")), 4).as("avg_duration_s"),
        pround(percentile(col("dur_s"), lit(0.5)), 4).as("p50_duration_s"))
    }),

    // Retention cohort matrix: users bucketed by signup week, then
    // distinct-active counts per (cohort, week offset) — the product
    // analytics standard. Two shuffles total: the per-user signup-min
    // and the cohort×offset count-distinct both key on user_id-sized
    // grains with map-side partials; the active-week frame dedups
    // BEFORE the join, so the join moves one row per (user, week),
    // not per event.
    "events_retention_cohorts" -> ((s, d) => {
      val feed = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
      // integer week index from the corpus epoch: cross-engine-stable
      // (ISO week functions disagree across engines at year edges)
      val wk = floor(datediff(to_date(col("event_time")),
        lit("2024-01-01").cast("date")) / 7.0).cast("int")
      val signup = feed.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(wk).as("cohort_week"))
      val active = feed.select(col("user_id"), wk.as("active_week"))
        .distinct()
      signup.join(active, "user_id")
        .filter(col("active_week") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          (col("active_week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // ORDERED conversion funnel — the sequence-aware twin of the
    // retention matrix: users who viewed, then clicked STRICTLY AFTER
    // their first view, then purchased strictly after that click.
    // Each stage is a per-user min-timestamp aggregate joined to the
    // next stage's event slice on user_id (co-partitioned, user-grain
    // frames — never an event×event product), so the plan is three
    // map-side-combinable aggregates and two slim joins; no window
    // function touches the raw stream.
    "events_funnel_ordered" -> ((s, d) => {
      val e = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("event_time")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("t2"))
        .groupBy("user_id").agg(count(lit(1)).as("np"))
      v.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("stage"), lit("view").as("step"), col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("stage"), lit("click").as("step"),
            col("n_users")))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("stage"), lit("purchase").as("step"),
            col("n_users")))
    }),

    // First-order Markov transition matrix of the event stream — the
    // behavioral fingerprint behind next-event prediction, bot
    // detection (impossible transitions), and synthetic-session
    // generation. Per-user ordering is a keyed window over the RAW
    // stream (sessionization-class linear cost — no Generate below
    // it, so PlanLint's expanded-sort rule stays quiet by
    // construction); transition counts aggregate map-side on the
    // 5×5-bounded type-pair grain, and the per-source totals are a
    // broadcast dimension. Probabilities follow one division
    // parenthesization mirrored in the oracle.
    "events_markov_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("event_time"), col("event_id"))
      val seq = graft.streaming.StreamingUpsert
        .eventFeed(Tables.load(s, d, "events"))
        .select(col("user_id"), col("event_type"), col("event_time"),
          col("event_id"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
      val cnt = seq.groupBy(col("event_type").as("from_type"),
          col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("from_type").agg(sum("n").as("t"))
      cnt.join(broadcast(tot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          pround(col("n").cast("double") / col("t"), 4).as("p"))
    }),

    // Winsorization — the clamp-don't-drop outlier treatment for rate
    // cleaning: per event type, values outside [p05, p95] are clamped
    // to the fence and counted. The exact per-type fences come from
    // one percentile buffer and broadcast back, so the event stream
    // never shuffles; the clamped value itself is emitted so the
    // operator is a corpus REWRITE (the dedup_span_clean convention),
    // not just a report.
    "clean_winsorize" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val fences = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.05)).as("lo"),
          percentile(col("value"), lit(0.95)).as("hi"))
      ev.join(broadcast(fences), "event_type")
        .select(col("event_id"), col("event_type"),
          pround(col("value"), 2).as("value"),
          pround(greatest(least(col("value"), col("hi")), col("lo")), 4)
            .as("value_w"),
          when(col("value") < col("lo"), -1)
            .when(col("value") > col("hi"), 1).otherwise(0).as("clamped"))
    }),

    // Robust anomaly detection over the event stream: per event type,
    // median + MAD (median absolute deviation) and the count of
    // values outside median ± 3·MAD — the outlier monitor that
    // survives heavy tails where mean/stddev break. Three passes over
    // a 5-type grain: exact median per type (one percentile buffer),
    // exact MAD over the re-centered values, then the flag count —
    // the per-type scalars broadcast back each time, so the event
    // stream itself never shuffles. Exact percentiles are the a4/a7
    // convention (quantile_cont twin); the ±3·MAD comparison runs on
    // the UNROUNDED scalars on both engines.
    "events_anomaly_mad" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      val withMed = ev.join(broadcast(med), "event_type")
      val mad = withMed.groupBy("event_type")
        .agg(max(col("med")).as("med"),
          percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
      ev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1)
            .otherwise(0)).as("n_anomalies"))
        .select(col("event_type"), pround(col("med"), 4).as("med"),
          pround(col("mad"), 4).as("mad"), col("n_events"),
          col("n_anomalies"))
    }),

    // The SKETCH TIER of clean_winsorize — what the same operator runs
    // as when the ApproxTier policy is on at 100 TB: the exact
    // per-type percentile buffers (ObjectHashAggregate holding EVERY
    // value of a group) are replaced by the mergeable HDR histogram
    // (≤~350 integer cells per type, map-side combinable, the gold-
    // sidecar geometry), and the fences become bucket-midpoint
    // estimates (≤2^-3 relative error). The clamp/count pass is then
    // EXACT against those estimated fences — approximation lives only
    // in where the fence sits, never in whether a row was clamped
    // consistently. Same output shape as the exact twin.
    "clean_winsorize_hdr" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val fences = graft.operators.Sketches.histQuantilesAt(
        graft.operators.Sketches.histBuckets(ev, Seq("event_type"), "value"),
        Seq("event_type"), Seq(0.05 -> "lo", 0.95 -> "hi"))
      ev.join(broadcast(fences), "event_type")
        .select(col("event_id"), col("event_type"),
          pround(col("value"), 2).as("value"),
          pround(greatest(least(col("value"), col("hi")), col("lo")), 4)
            .as("value_w"),
          when(col("value") < col("lo"), -1)
            .when(col("value") > col("hi"), 1).otherwise(0).as("clamped"))
    }),

    // The sketch tier of events_anomaly_mad: median and MAD come from
    // two HDR histograms (value, then |value − med̂| re-centered on
    // the broadcast estimate) instead of two exact percentile
    // buffers — three scans either way, but per-group state drops
    // from O(values) to ≤~350 cells, which is the difference between
    // an operator that fits executor memory at 100 TB and one that
    // doesn't. The ±3·MAD comparison runs on the UNROUNDED bucket
    // reps on both engines (the exact twin's convention), so the
    // anomaly count is exact given the estimated scalars.
    "events_anomaly_hdr" -> ((s, d) => {
      import graft.operators.Sketches
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("value"))
      val med = Sketches.histQuantilesAt(
        Sketches.histBuckets(ev, Seq("event_type"), "value"),
        Seq("event_type"), Seq(0.5 -> "med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("value") - col("med")).as("adev"))
      val mad = Sketches.histQuantilesAt(
        Sketches.histBuckets(dev, Seq("event_type"), "adev"),
        Seq("event_type"), Seq(0.5 -> "mad"))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1)
            .otherwise(0)).as("n_anomalies"))
        .select(col("event_type"), pround(col("med"), 4).as("med"),
          pround(col("mad"), 4).as("mad"), col("n_events"),
          col("n_anomalies"))
    }),

    // CDC apply: collapse a keyed change log into the current
    // snapshot, WITH delete semantics — the missing half of
    // j12_upsert/W1 (which only ever keep-latest). The event log
    // stands in for the change stream: every event upserts its user's
    // row, 'error' is the tombstone, event_id the version. One
    // map-side-combinable aggregate (max-by-version struct + change
    // counters ride the same groupBy) — no window sort, so a hot key
    // costs a combiner, not a partition-wide sort, and the plan is one
    // exchange at any log size. Keys whose LAST op is the tombstone
    // drop out of the snapshot after the aggregate.
    "cdc_apply" -> ((s, d) =>
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .groupBy("user_id")
        .agg(max(struct(col("event_id"), col("event_type"), col("value")))
            .as("last"),
          count(lit(1)).as("n_changes"),
          sum(when(col("event_type") === "error", 1).otherwise(0))
            .as("n_deletes"))
        .filter(col("last.event_type") =!= "error")
        .select(col("user_id"),
          col("last.event_id").as("last_version"),
          col("last.event_type").as("last_op"),
          col("last.value").as("value"),
          col("n_changes"), col("n_deletes")))
  )

  def oracles: Map[String, String] = Map(
    "s5_codelist_filter" -> s"""$R
      SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
      WHERE billing_code IN ('17','42','100','417','998','1500','2000')""",

    "a1_state_group_mean" -> s"""
      SELECT n_name AS state, ${avgS("s_acctbal")} AS state_wi_avg,
             COUNT(*) AS n_rows
      FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal > 0 GROUP BY 1""",

    "a2_regex_key_group_mean" -> s"""
      SELECT regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
             ${avgS("p_retailprice")} AS avg_work,
             ${avgS("p_size")} AS avg_pe,
             ${avgS("p_partkey % 100")} AS avg_mp
      FROM part GROUP BY 1""",

    "a3_national_mean" -> s"""
      SELECT ${avgS("p_retailprice")} AS nat_work,
             ${avgS("p_size")} AS nat_pe,
             ${avgS("p_partkey % 100")} AS nat_mp
      FROM part""",

    "a9_category_drilldown" -> s"""
      SELECT c_mktsegment, COUNT(*) AS record_count,
             COUNT(DISTINCT o_custkey) AS unique_customers,
             COUNT(DISTINCT o_orderpriority) AS unique_priorities,
             ${avgS("o_totalprice")} AS avg_price,
             ${prS("MIN(o_totalprice)")} AS min_price,
             ${prS("MAX(o_totalprice)")} AS max_price
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY record_count DESC, c_mktsegment
      LIMIT 3 OFFSET 1""",

    "a10_search_stats" -> """
      SELECT COUNT(*) AS total_rows,
             COUNT(DISTINCT l_partkey) AS unique_codes,
             COUNT(DISTINCT l_suppkey) AS unique_providers,
             COUNT(DISTINCT o_custkey) AS unique_customers,
             COUNT(DISTINCT c_mktsegment) AS unique_segments,
             COUNT(DISTINCT n_name) AS unique_states,
             COUNT(DISTINCT o_orderpriority) AS unique_priorities,
             COUNT(DISTINCT l_returnflag) AS unique_flags,
             COUNT(DISTINCT l_linestatus) AS unique_modes
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN supplier ON l_suppkey = s_suppkey
      LEFT JOIN nation ON s_nationkey = n_nationkey""",

    "a13_search_grouped" -> s"""
      SELECT n_name, COUNT(*) AS n_providers,
             ${avgS("s_acctbal")} AS avg_bal,
             ${prS("MIN(s_acctbal)")} AS min_bal,
             ${prS("MAX(s_acctbal)")} AS max_bal
      FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
      WHERE lower(coalesce(s_name, '') || ' ' || coalesce(n_name, ''))
            LIKE '%e%'
      GROUP BY 1 ORDER BY n_providers DESC, n_name""",

    "j9_computed_slug_join" -> """
      SELECT o_orderkey, o.cust_slug, c_mktsegment,
             floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price
      FROM (SELECT o_orderkey, o_totalprice,
              'customer_' || lpad(CAST(o_custkey AS VARCHAR), 9, '0') AS cust_slug
            FROM orders) o
      LEFT JOIN (
        SELECT regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9]+', '_', 'g'),
                              '^_+|_+$', '', 'g') AS cust_slug,
               c_mktsegment
        FROM customer) c
      ON o.cust_slug = c.cust_slug""",

    "j10_five_way_star" -> """
      SELECT l_orderkey, l_linenumber, c_name, s_name, n_name AS state,
             o_orderpriority,
             floor((l_extendedprice) * 100.0 + 0.5) / 100.0 AS rate
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 1""",

    "bench_crossjoin_build" -> """
      SELECT n_name AS state, CAST(p_partkey AS VARCHAR) AS code,
             floor(((
               (p_retailprice / 100.0) * (n_nationkey % 10 / 10.0 + 0.8) +
               (p_size / 10.0)         * (n_nationkey % 7 / 10.0 + 0.9) +
               (p_partkey % 13 / 100.0) * (n_nationkey % 5 / 10.0 + 0.5)
             ) * 32.35) * 100.0 + 0.5) / 100.0 AS medicare_prof_rate
      FROM nation CROSS JOIN part""",

    // the same four lookups and the same zero-filled formula, replayed
    // relationally; integer-derived gpci/rvu doubles are identical on
    // both engines, so only the final rate rounds
    "medicare_locality_chain" -> """
      WITH pairs AS (
        SELECT DISTINCT
               lpad(CAST((l_suppkey * 7) % 100000 AS VARCHAR), 5, '0')
                 AS zip_code,
               CAST(l_partkey AS VARCHAR) AS procedure_code
        FROM lineitem WHERE l_orderkey % 7 = 0),
      lmap AS (
        SELECT DISTINCT
               lpad(CAST((s_suppkey * 7) % 100000 AS VARCHAR), 5, '0')
                 AS zip_code,
               'MAC' || CAST(s_suppkey % 5 AS VARCHAR) AS carrier_code,
               CAST(s_suppkey % 8 AS INTEGER) AS locality_code
        FROM supplier),
      meta AS (
        SELECT DISTINCT 'MAC' || CAST(n_nationkey % 5 AS VARCHAR) AS mac_code,
               CAST(i AS INTEGER) AS m_loc,
               'FSA_MAC' || CAST(n_nationkey % 5 AS VARCHAR) || '_' ||
                 CAST(i AS VARCHAR) AS fee_schedule_area
        FROM nation CROSS JOIN (SELECT unnest(range(0, 8)) AS i)),
      gpci AS (
        SELECT fee_schedule_area AS locality_name, m_loc AS g_loc,
               m_loc / 10.0 + 0.8 AS work_gpci,
               m_loc % 3 / 10.0 + 0.9 AS pe_gpci,
               m_loc % 5 / 10.0 + 0.5 AS mp_gpci
        FROM meta),
      rvu AS (
        SELECT CAST(p_partkey AS VARCHAR) AS procedure_code,
               p_retailprice / 100.0 AS work_rvu,
               p_size / 10.0 AS practice_expense_rvu,
               p_partkey % 13 / 100.0 AS malpractice_rvu
        FROM part)
      SELECT p.zip_code, p.procedure_code, l.carrier_code,
             l.locality_code, m.fee_schedule_area,
             floor((
               (COALESCE(r.work_rvu, 0) * COALESCE(g.work_gpci, 0) +
                COALESCE(r.practice_expense_rvu, 0) * COALESCE(g.pe_gpci, 0) +
                COALESCE(r.malpractice_rvu, 0) * COALESCE(g.mp_gpci, 0))
               * 32.74) * 100.0 + 0.5) / 100.0 AS medicare_prof
      FROM pairs p
      LEFT JOIN lmap l USING (zip_code)
      LEFT JOIN meta m ON l.carrier_code = m.mac_code
                      AND l.locality_code = m.m_loc
      LEFT JOIN gpci g ON m.fee_schedule_area = g.locality_name
                      AND l.locality_code = g.g_loc
      LEFT JOIN rvu r USING (procedure_code)""",

    "autocomplete_distinct" -> """
      SELECT DISTINCT p_name FROM part
      WHERE lower(p_name) LIKE 'bl%' ORDER BY p_name LIMIT 20""",

    "p1_p2_rename_drop" -> """
      SELECT l_orderkey, l_linenumber, l_partkey AS code,
             l_extendedprice AS rate
      FROM lineitem""",

    "p11_required_fields" -> s"""$R
      SELECT l_orderkey, l_linenumber, billing_code, expiration_date
      FROM rates
      WHERE billing_code IS NOT NULL AND expiration_date IS NOT NULL
        AND payer_slug IS NOT NULL""",

    "s7_year_modifier_filter" -> """
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 5 = 0 THEN '26'
                  WHEN o_orderkey % 5 = 1 THEN ''
                  ELSE NULL END AS modifier
      FROM orders
      WHERE year(o_orderdate) = 1995
        AND (CASE WHEN o_orderkey % 5 = 0 THEN '26'
                  WHEN o_orderkey % 5 = 1 THEN ''
                  ELSE NULL END IS NULL
             OR CASE WHEN o_orderkey % 5 = 0 THEN '26'
                     WHEN o_orderkey % 5 = 1 THEN ''
                     ELSE NULL END = '')""",

    "j6_scalar_map_join" -> """
      SELECT CAST(s_suppkey AS VARCHAR) AS provider_group_id,
             n_name AS state,
             floor((n_nationkey / 25.0 + 0.7) * 10000.0 + 0.5) / 10000.0
               AS state_wi_avg
      FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""",

    "j14_conditional_join" -> s"""$R
      SELECT COUNT(*) AS rate_count,
             ${avgS("negotiated_rate")} AS avg_rate,
             ${prS("MIN(negotiated_rate)")} AS min_rate,
             ${prS("MAX(negotiated_rate)")} AS max_rate,
             ${prS("quantile_cont(negotiated_rate, 0.5)")} AS median_rate,
             COUNT(DISTINCT billing_code) AS unique_codes
      FROM rates LEFT JOIN (
        SELECT CAST(s_suppkey AS VARCHAR) AS provider_group_id,
               n_name AS state
        FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey) p
        ON rates.provider_reference_id = p.provider_group_id
      WHERE year_month = '1995-09' AND billing_class = 'professional'
        AND negotiated_rate >= 100.0 AND state = 'NATION_9'""",

    // Same (ts, event_id) ordering; the sliding sum replays over the
    // identical integer cents, so window-sum association can't drift.
    "events_rolling_features" -> """
      SELECT event_id, user_id,
             CAST(row_number() OVER w AS INTEGER) AS seq,
             lag(value, 1) OVER w AS prev_value,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS recent_cnt,
             CAST(coalesce(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS recent_sum_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    // The oracle states the interval join DIRECTLY as an inequality
    // left join (DuckDB's IEJoin handles it at oracle scale) — proving
    // the bin-explode + equi-join + refine plan computes exactly the
    // declarative temporal semantics.
    "events_interval_join" -> """
      WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events),
      c AS (SELECT event_id AS click_id, user_id, us AS cus
            FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, us AS pus
            FROM e WHERE event_type = 'purchase')
      SELECT c.click_id,
             COUNT(p.pus) AS n_purchases_30m,
             MIN(p.pus - c.cus) AS min_lag_us
      FROM c LEFT JOIN p
        ON p.user_id = c.user_id
       AND p.pus >= c.cus AND p.pus < c.cus + 1800000000
      GROUP BY 1""",

    // Same change-detection lag, same lead-close over the change rows,
    // same (ts, event_id) ordering and string rendering.
    "scd2_user_history" -> """
      WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev
        FROM events),
      ch AS (
        SELECT user_id, event_type, ts, event_id FROM o
        WHERE prev IS NULL OR event_type <> prev),
      h AS (
        SELECT user_id, event_type, ts,
               lead(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS valid_to_ts
        FROM ch)
      SELECT user_id, event_type AS state,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             CASE WHEN valid_to_ts IS NULL THEN 1 ELSE 0 END AS is_current
      FROM h""",

    // lag → gap test in microseconds → running-sum session ids →
    // per-session min/max/count, exactly the sessionizeBatch chain.
    "events_sessionize" -> """
      WITH x AS (
        SELECT user_id, ts AS event_time,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
      y AS (
        SELECT user_id, event_time,
               CASE WHEN prev IS NULL
                      OR epoch_us(event_time) - epoch_us(prev) > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM x),
      z AS (
        SELECT user_id, event_time,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY event_time
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM y)
      SELECT user_id,
             strftime(MIN(event_time), '%Y-%m-%d %H:%M:%S.%f')
               AS session_start,
             strftime(MAX(event_time), '%Y-%m-%d %H:%M:%S.%f')
               AS session_end,
             CAST(COUNT(*) AS INTEGER) AS n_events
      FROM z GROUP BY user_id, sid""",

    // same gaps-and-islands chain as events_sessionize, aggregated to
    // session grain; quantile_cont = Spark's exact percentile
    "events_session_stats" -> """
      WITH x AS (
        SELECT user_id, ts AS event_time,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
      y AS (
        SELECT user_id, event_time,
               CASE WHEN prev IS NULL
                      OR epoch_us(event_time) - epoch_us(prev) > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM x),
      z AS (
        SELECT user_id, event_time,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY event_time
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM y),
      sess AS (
        SELECT CAST(COUNT(*) AS INTEGER) AS n_events,
               (epoch_us(MAX(event_time)) - epoch_us(MIN(event_time)))
                 / 1000000.0 AS dur_s
        FROM z GROUP BY user_id, sid)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single,
             floor(AVG(n_events) * 10000.0 + 0.5) / 10000.0 AS avg_events,
             MAX(n_events) AS max_events,
             floor(AVG(dur_s) * 10000.0 + 0.5) / 10000.0
               AS avg_duration_s,
             floor(quantile_cont(dur_s, 0.5) * 10000.0 + 0.5) / 10000.0
               AS p50_duration_s
      FROM sess""",

    "events_retention_cohorts" -> """
      WITH wk AS (
        SELECT user_id, event_type,
               CAST(floor(date_diff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) / 7.0) AS INTEGER) AS w
        FROM events),
      signup AS (
        SELECT user_id, min(w) AS cohort_week
        FROM wk WHERE event_type = 'signup' GROUP BY 1),
      active AS (SELECT DISTINCT user_id, w AS active_week FROM wk)
      SELECT cohort_week, active_week - cohort_week AS week_offset,
             count(DISTINCT user_id) AS n_users
      FROM signup JOIN active USING (user_id)
      WHERE active_week >= cohort_week
      GROUP BY 1, 2""",

    // same strict-after chaining; timestamp comparisons are µs-exact
    // in both engines
    "events_funnel_ordered" -> """
      WITH e AS (SELECT user_id, event_type, ts FROM events),
      v AS (SELECT user_id, min(ts) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
      p AS (SELECT e.user_id FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
      SELECT CAST(1 AS INTEGER) AS stage, 'view' AS step,
             (SELECT count(*) FROM v) AS n_users
      UNION ALL SELECT CAST(2 AS INTEGER), 'click',
             (SELECT count(*) FROM c)
      UNION ALL SELECT CAST(3 AS INTEGER), 'purchase',
             (SELECT count(*) FROM p)""",

    // same (ts, event_id) ordering, same division parenthesization
    "events_markov_transitions" -> """
      WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
        FROM events),
      cnt AS (SELECT event_type AS from_type, to_type, count(*) AS n
              FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, sum(n) AS t FROM cnt GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n,
             floor((CAST(c.n AS DOUBLE) / t) * 10000.0 + 0.5) / 10000.0
               AS p
      FROM cnt c JOIN tot USING (from_type)""",

    // same exact quantile_cont fences, same unrounded clamp compare
    "clean_winsorize" -> """
      WITH f AS (
        SELECT event_type, quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type,
             floor(e.value * 100.0 + 0.5) / 100.0 AS value,
             floor(greatest(least(e.value, f.hi), f.lo) * 10000.0 + 0.5)
               / 10000.0 AS value_w,
             CASE WHEN e.value < f.lo THEN -1
                  WHEN e.value > f.hi THEN 1 ELSE 0 END AS clamped
      FROM events e JOIN f USING (event_type)""",

    // same integer bucket math as Sketches.histBuckets/histQuantilesAt,
    // same estimated fences, same unrounded clamp compare
    "clean_winsorize_hdr" -> s"""
      WITH ev AS (SELECT event_id, event_type, value FROM events),
      ${histCteSql("ev", "event_type", "value",
        Seq("0.05" -> "lo", "0.95" -> "hi"), "f")}
      SELECT e.event_id, e.event_type,
             floor(e.value * 100.0 + 0.5) / 100.0 AS value,
             floor(greatest(least(e.value, q.hi), q.lo) * 10000.0 + 0.5)
               / 10000.0 AS value_w,
             CASE WHEN e.value < q.lo THEN -1
                  WHEN e.value > q.hi THEN 1 ELSE 0 END AS clamped
      FROM ev e JOIN fq q USING (event_type)""",

    // two replayed histograms (value, then |value − med̂|), same
    // unrounded ±3·MAD test against the bucket reps
    "events_anomaly_hdr" -> s"""
      WITH ev AS (SELECT event_type, value FROM events),
      ${histCteSql("ev", "event_type", "value", Seq("0.5" -> "med"), "m")},
      dev AS (
        SELECT ev.event_type, abs(ev.value - mq.med) AS adev
        FROM ev JOIN mq USING (event_type)),
      ${histCteSql("dev", "event_type", "adev", Seq("0.5" -> "mad"), "d")}
      SELECT ev.event_type,
             floor(mq.med * 10000.0 + 0.5) / 10000.0 AS med,
             floor(dq.mad * 10000.0 + 0.5) / 10000.0 AS mad,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN abs(ev.value - mq.med) > 3.0 * dq.mad
               THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM ev JOIN mq USING (event_type) JOIN dq USING (event_type)
      GROUP BY 1, 2, 3""",

    // same two-level exact quantile_cont, same unrounded ±3·MAD test
    "events_anomaly_mad" -> """
      WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
      j AS (
        SELECT e.event_type, e.value, m.med
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, max(med) AS med,
               quantile_cont(abs(value - med), 0.5) AS mad
        FROM j GROUP BY 1)
      SELECT j.event_type,
             floor(m2.med * 10000.0 + 0.5) / 10000.0 AS med,
             floor(m2.mad * 10000.0 + 0.5) / 10000.0 AS mad,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN abs(j.value - m2.med) > 3.0 * m2.mad
               THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM j JOIN mad m2 USING (event_type)
      GROUP BY j.event_type, m2.med, m2.mad""",

    // keep-last via the window formulation (the struct-max has no SQL
    // twin); event_id is unique per key so the order is total
    "cdc_apply" -> """
      WITH v AS (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id) AS n_deletes
        FROM events)
      SELECT user_id, event_id AS last_version, event_type AS last_op,
             value, n_changes, CAST(n_deletes AS BIGINT) AS n_deletes
      FROM v WHERE rn = 1 AND event_type <> 'error'"""
  )
}
