package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Roles, RolesSql, Tables}
import graft.functions.NormExprs._
import graft.functions.Categorizer

/** A named set of queries, each with an optional DuckDB oracle twin.
  * Column names/types/rounding MUST match between the two sides — the
  * driver sorts columns by name and hashes values.
  */
trait QueryPack {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracles: Map[String, String]
}

/** The reference's relational operator inventory (SURVEY.md §2),
  * expressed over the TPC-H-ish testdata via the Roles mapping.
  *
  * Scale notes (local[32] tests correctness; the plan shapes target a
  * real cluster):
  *  - every dim/LUT join is an explicit `broadcast()` — no shuffle of
  *    the big fact side;
  *  - aggregations are partial-agg friendly (plain groupBy over
  *    built-ins, so map-side combine applies);
  *  - exact percentiles match the DuckDB oracle; at 100 TB swap for
  *    `percentile_approx` per SURVEY §2.4's note.
  */
object Inventory extends QueryPack {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def rates(s: SparkSession, d: String) = Roles.rates(s, d)
  private def providers(s: SparkSession, d: String) = Roles.providers(s, d)

  private val R = s"WITH rates AS (${RolesSql.rates})"
  private val RP =
    s"WITH rates AS (${RolesSql.rates}), providers AS (${RolesSql.providers})"

  /** SQL string literal with quote escaping. */
  private def lit_(v: String) = "'" + v.replace("'", "''") + "'"

  /** Exact 2-decimal average: DECIMAL sum (no fp accumulation-order
    * noise between engines) then portable rounding. */
  private def avg2(c: org.apache.spark.sql.Column) =
    pround(sum(c.cast("decimal(18,2)")).cast("double") / count(c), 2)

  /** SQL twins of pround / avg2 / exact quantile (DuckDB side). */
  private def prS(e: String, scale: Int = 2): String = {
    val f = math.pow(10, scale)
    s"floor(($e) * $f + 0.5) / $f"
  }
  private def avgS(x: String): String =
    prS(s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)")
  private def qS(x: String, p: String): String = prS(s"quantile_cont($x, $p)")

  // ---------------------------------------------------------------- scans

  private val s4Cols = Seq("l_orderkey" -> "bigint", "l_quantity" -> "double",
    "negotiated_type" -> "string")

  // ------------------------------------------------------------- queries

  def queries: Map[String, QFn] = Map(
    // S4: schema-tolerant projected scan (missing col back-filled null)
    "s4_tolerant_scan" -> ((s, d) =>
      Tables.readTolerant(s, s"$d/lineitem.parquet", s4Cols)),

    // P3: IN-set filter on billing_code (main.py:205-218)
    "p3_code_inset" -> ((s, d) =>
      rates(s, d)
        .filter(col("billing_code").isin("17", "42", "100", "417", "998", "1500"))
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")),

    // P4+P6: null-key + rate-bounds data-quality filter
    "p4_p6_quality_filter" -> ((s, d) =>
      rates(s, d)
        .filter(col("provider_reference_id").isNotNull &&
          col("negotiated_rate").between(0.01, 50000) &&
          col("billing_class") === "professional")
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")),

    // P7: whitelist contains-any filter (taxonomy_filter.py:85-107)
    "p7_contains_any" -> ((s, d) => {
      val terms = Seq("small", "large", "promo")
      Tables.load(s, d, "part")
        .filter(terms.map(t => lower(col("p_type")).contains(t)).reduce(_ || _))
        .select("p_partkey", "p_name", "p_type")
    }),

    // P9: full-row dedup (data_cleaner.py:56-64)
    "p9_row_dedup" -> ((s, d) =>
      li(s, d).select(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status")).distinct()),

    // W1: keyed keep-latest dedup (utils_nppes.py:226-252). Expressed as
    // max(struct(...)) — lexicographic max over the sort key — rather
    // than a row_number window: the aggregate gets map-side partial
    // combine and never sorts whole partitions, so at 100 TB the shuffle
    // ships one candidate row per key per mapper instead of every row.
    "w1_latest_dedup" -> ((s, d) =>
      li(s, d).groupBy("l_orderkey")
        .agg(max(struct(col("l_shipdate"), col("l_linenumber"),
          col("l_extendedprice"))).as("top"))
        .select(col("l_orderkey"),
          date_format(col("top.l_shipdate"), "yyyy-MM-dd").as("last_updated"),
          col("top.l_linenumber").as("l_linenumber"),
          col("top.l_extendedprice").as("rate"))),

    // W2: top-1 per key by ratio (api_clients.py:300-306)
    "w2_top1_per_key" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.load(s, d, "part").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("p_brand", "p_partkey", "p_retailprice")
    }),

    // J1: fact ⋈ broadcast provider dim, left (main.py:166-187)
    "j1_enrich_left" -> ((s, d) => {
      val r = rates(s, d)
      val p = providers(s, d)
      r.join(broadcast(p),
          r("provider_reference_id") === p("provider_group_id"), "left")
        .select(r("l_orderkey"), r("l_linenumber"), r("billing_code"),
          r("negotiated_rate"), p("provider_name"), p("state"))
    }),

    // J2+F13: left join + combine_first rate backfill (main.py:330-378)
    "j2_coalesce_backfill" -> ((s, d) => {
      val gaWc = Tables.load(s, d, "part")
        .filter(col("p_size") % 3 === 0) // partial coverage, like GA-WC
        .select(col("p_partkey").cast("string").as("wc_code"),
          pround(col("p_retailprice") * 0.9, 2).as("wc_rate"))
      val r = rates(s, d)
      r.join(broadcast(gaWc), r("billing_code") === col("wc_code"), "left")
        .select(r("l_orderkey"), r("l_linenumber"), r("billing_code"),
          pround(coalesce(col("wc_rate"), r("negotiated_rate")), 2)
            .as("final_rate"))
    }),

    // P8: not-in filter (notebooks/appendprod.ipynb cell 14)
    "p8_notin_filter" -> ((s, d) =>
      Tables.load(s, d, "part")
        .filter(!col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .select("p_partkey", "p_brand")),

    // F20: explode POS members → xref_pos (prod_etl/notebook.py:167) —
    // the repo's one generator-shaped op. Two plan-shape rules apply:
    //  - dedup-BEFORE-normalize (the J4 keyframe pattern): the raw
    //    service_codes domain is tiny, so distinct first and the
    //    interpreted from_json/HOF normalization runs once per distinct
    //    value instead of once per fact row (distinct normalized values
    //    can still collide, hence the second dedup on the set id);
    //  - explode_outer, NOT explode: an inner explode lets
    //    InferFiltersFromGenerate derive `size(members)>0 AND
    //    isnotnull(members)` and push it below both distincts to the
    //    SCAN, re-expanding the whole interpreted chain per fact row —
    //    twice (measured 5.3 s; with the outer form + post-Generate
    //    null filter, 0.9 s — identical rows, empty sets drop as null).
    "f20_explode_pos" -> ((s, d) => {
      val posSets = rates(s, d)
        .select(col("service_codes")).distinct()
        .withColumn("pos_members", posMembers(col("service_codes")))
        .withColumn("pos_set_id", posSetId(col("pos_members")))
        .select("pos_set_id", "pos_members").distinct()
      posSets.select(col("pos_set_id"),
          explode_outer(col("pos_members")).as("pos"))
        .filter(col("pos").isNotNull)
    }),

    // J4: dedup key-frame → broadcast lookup chain → join back (main.py:441-526)
    "j4_keyframe_chain" -> ((s, d) => {
      val l = li(s, d)
      val keyframe = l.select("l_partkey").dropDuplicates("l_partkey")
      val part = Tables.load(s, d, "part")
      val enriched = keyframe
        .join(broadcast(part), keyframe("l_partkey") === part("p_partkey"), "left")
        .select(col("l_partkey"), pround(col("p_retailprice") *
          (lit(1.0) + col("p_size") / lit(100.0)), 2).as("medicare_calc"))
      l.join(broadcast(enriched), Seq("l_partkey"), "left")
        .select("l_orderkey", "l_linenumber", "l_partkey", "medicare_calc")
    }),

    // J5: normalized-code LUT lookup, LUT deduped on key first (main.py:722-754)
    "j5_lut_lookup" -> ((s, d) => {
      val lut = Tables.load(s, d, "part")
        .groupBy(normCode((col("p_partkey") % 500).cast("string")).as("hcpcs_norm"))
        .agg(pround(min(col("p_retailprice")), 2).as("lut_rate"))
      val r = rates(s, d)
      r.join(broadcast(lut), normCode(r("billing_code")) === lut("hcpcs_norm"), "left")
        .select(r("l_orderkey"), r("l_linenumber"), r("billing_code"), col("lut_rate"))
    }),

    // J7: class-routed benchmark join + pct_of_medicare (benchmark_joiner.py:56-198)
    "j7_class_routed_bench" -> ((s, d) => {
      val part = Tables.load(s, d, "part")
      val bp = part.select(col("p_partkey").cast("string").as("bp_code"),
        pround(col("p_retailprice") * 0.8, 2).as("bench_prof"))
      val bo = part.select(col("p_partkey").cast("string").as("bo_code"),
        pround(col("p_retailprice") * 1.1, 2).as("bench_opps"))
      val r = rates(s, d)
      val bench = when(col("billing_class") === "professional", col("bench_prof"))
        .otherwise(col("bench_opps"))
      r.join(broadcast(bp), r("billing_code") === col("bp_code"), "left")
        .join(broadcast(bo), r("billing_code") === col("bo_code"), "left")
        .select(r("l_orderkey"), r("l_linenumber"), r("billing_class"),
          r("negotiated_rate"), bench.as("benchmark_rate"),
          pround(pctOfMedicare(r("negotiated_rate"), bench), 4).as("pct_of_medicare"))
    }),

    // J11: anti-join append-unique (prod_etl/ETL_1.py:359-366)
    "j11_anti_append" -> ((s, d) => {
      val r = rates(s, d)
      val existing = r.filter(col("year_month") < "1995-07").select("billing_code")
      r.filter(col("year_month") >= "1995-07").select("billing_code").distinct()
        .join(existing, Seq("billing_code"), "left_anti")
    }),

    // J12: idempotent upsert — existing ∪ (stage anti existing) (ETL_1.py:450-498).
    // year_month is a grain key, so one shared aggregation feeds both
    // sides (filter-after-agg ≡ filter-before-agg) — one shuffle, not two.
    "j12_upsert" -> ((s, d) => {
      val grain = rates(s, d)
        .groupBy("billing_code", "payer_slug", "year_month")
        .agg(pround(min(col("negotiated_rate")), 2).as("rate"))
        .select(col("year_month"),
          uid(col("billing_code"), col("payer_slug"), col("year_month"))
            .as("fact_uid"), col("rate"))
      def side(cond: org.apache.spark.sql.Column, src: String) =
        grain.filter(cond).select(col("fact_uid"), col("rate"), lit(src).as("src"))
      val existing = side(col("year_month") <= "1995-12", "existing")
      val stage = side(col("year_month") >= "1995-01", "stage")
      existing.unionByName(
        stage.join(existing.select("fact_uid"), Seq("fact_uid"), "left_anti"))
    }),

    // J13: POS semi-join filter (Data_Schema.md:192-207)
    "j13_semi_filter" -> ((s, d) => {
      val keep = Tables.load(s, d, "part")
        .filter(col("p_size") === 11)
        .select(col("p_partkey").cast("string").as("billing_code"))
      rates(s, d).join(keep, Seq("billing_code"), "left_semi")
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")
    }),

    // A4: filtered rate summary with exact median (data_queries.py:96-107).
    // Distinct counts via collect_set: the exact-percentile buffer
    // already forces an ObjectHashAggregate holding every value, so the
    // sets add no new memory class but remove the countDistinct Expand
    // (×3 the aggregation input).
    "a4_rate_summary" -> ((s, d) =>
      rates(s, d)
        .filter(col("billing_class") === "professional" &&
          col("year_month").between("1994-01", "1996-12"))
        .agg(count(lit(1)).as("rate_count"),
          avg2(col("negotiated_rate")).as("avg_rate"),
          pround(min(col("negotiated_rate")), 2).as("min_rate"),
          pround(max(col("negotiated_rate")), 2).as("max_rate"),
          pround(percentile(col("negotiated_rate"), lit(0.5)), 2).as("median_rate"),
          size(collect_set(col("billing_code"))).cast("long").as("unique_codes"),
          size(collect_set(col("payer_slug"))).cast("long").as("unique_payers"))),

    // A5: per-payer stats, top-k by count (data_queries.py:130-199).
    // collect_set distinct count — rides the percentile's
    // ObjectHashAggregate, no Expand (see A4).
    "a5_payer_stats" -> ((s, d) =>
      rates(s, d).groupBy("payer_slug")
        .agg(count(lit(1)).as("rate_count"),
          avg2(col("negotiated_rate")).as("avg_rate"),
          pround(percentile(col("negotiated_rate"), lit(0.5)), 2).as("median_rate"),
          size(collect_set(col("billing_code"))).cast("long").as("unique_codes"))
        .orderBy(col("rate_count").desc, col("payer_slug"))
        .limit(3)),

    // A5b + J8: per-procedure stats with code_desc coalesce (data_queries.py:174-199)
    "a5_procedure_stats" -> ((s, d) => {
      val dimCode = Tables.load(s, d, "part")
        .select(col("p_partkey").cast("string").as("code"), col("p_name"))
      val r = rates(s, d)
      r.join(broadcast(dimCode), r("billing_code") === dimCode("code"), "left")
        .groupBy(col("code_type"), col("billing_code"),
          coalesce(col("p_name"), col("billing_code")).as("code_desc"))
        .agg(count(lit(1)).as("rate_count"),
          avg2(col("negotiated_rate")).as("avg_rate"),
          pround(min(col("negotiated_rate")), 2).as("min_rate"),
          pround(max(col("negotiated_rate")), 2).as("max_rate"))
        .orderBy(col("rate_count").desc, col("billing_code"))
        .limit(25)
    }),

    // A6: payer index aggregate (optimized_queries.py:151-169).
    // Distinct counts as collect_set sizes: two countDistincts would
    // plan an Expand tripling the aggregation input; the sets ride one
    // un-expanded ObjectHashAggregate (bounded per group by the code /
    // provider-group domains, which are dims — not SF-scaled).
    "a6_payer_index" -> ((s, d) => {
      val r = rates(s, d)
      val p = providers(s, d)
      r.join(broadcast(p),
          r("provider_reference_id") === p("provider_group_id"), "left")
        .groupBy("payer_slug", "state", "year_month")
        .agg(count(lit(1)).as("rate_count"),
          avg2(col("negotiated_rate")).as("avg_rate"),
          size(collect_set(col("billing_code"))).cast("long")
            .as("unique_codes"),
          size(collect_set(col("provider_group_id"))).cast("long")
            .as("unique_provider_groups"))
    }),

    // A7: market-rate quantile profile p10..p90 (prod_etl/notebook.py:371-406).
    // All five points from ONE percentile buffer — the per-group sort
    // happens once, not five times.
    "a7_market_profile" -> ((s, d) => {
      val ps = Seq(0.10, 0.25, 0.50, 0.75, 0.90)
      rates(s, d).groupBy("year_month", "billing_class")
        .agg(size(collect_set(col("provider_reference_id"))).cast("long")
            .as("n_providers"),
          count(lit(1)).as("n_rates"),
          percentile(col("negotiated_rate"), array(ps.map(lit): _*)).as("qs"),
          avg2(col("negotiated_rate")).as("avg_rate"),
          pround(min(col("negotiated_rate")), 2).as("min_rate"),
          pround(max(col("negotiated_rate")), 2).as("max_rate"))
        .withColumn("p10", pround(element_at(col("qs"), 1), 2))
        .withColumn("p25", pround(element_at(col("qs"), 2), 2))
        .withColumn("p50", pround(element_at(col("qs"), 3), 2))
        .withColumn("p75", pround(element_at(col("qs"), 4), 2))
        .withColumn("p90", pround(element_at(col("qs"), 5), 2))
        .drop("qs")
        .select("year_month", "billing_class", "n_providers", "n_rates",
          "p10", "p25", "p50", "p75", "p90", "avg_rate", "min_rate",
          "max_rate")
    }),

    // A8: dimension-value counts (backend/main.py:505-580)
    "a8_dim_value_counts" -> ((s, d) =>
      Tables.load(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"), avg2(col("value")).as("avg_value"))
        .orderBy(col("n").desc, col("event_type"))),

    // A11: masked coverage counts (benchmark_joiner.py:200-247)
    "a11_masked_coverage" -> ((s, d) =>
      rates(s, d).agg(
        count(lit(1)).as("total_rows"),
        count(when(col("billing_class") === "professional", 1)).as("prof_rows"),
        count(when(col("billing_class") === "institutional", 1)).as("inst_rows"),
        count(when(col("billing_class") === "professional" &&
          col("negotiated_rate") > 40000, 1)).as("prof_benchmarked"),
        count(when(col("billing_class") === "institutional" &&
          col("negotiated_rate") > 40000, 1)).as("inst_benchmarked"))),

    // A12: availability matrix (data_queries.py:40-77). collect_set
    // over the bounded payer/code domains, not countDistinct — see A6.
    "a12_availability" -> ((s, d) => {
      val r = rates(s, d)
      val p = providers(s, d)
      r.join(broadcast(p),
          r("provider_reference_id") === p("provider_group_id"), "left")
        .groupBy("state", "year_month")
        .agg(count(lit(1)).as("record_count"),
          size(collect_set(col("payer_slug"))).cast("long")
            .as("unique_payers"),
          size(collect_set(col("billing_code"))).cast("long")
            .as("unique_codes"))
    }),

    // §2.6: top-k by rate (optimized_queries.py:687-688)
    "sort_topk" -> ((s, d) =>
      rates(s, d)
        .orderBy(col("negotiated_rate").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")
        .limit(100)),

    // §2.6: pagination LIMIT/OFFSET (optimized_queries.py:866-883)
    "sort_pagination" -> ((s, d) =>
      rates(s, d)
        .orderBy(col("negotiated_rate").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "billing_code", "negotiated_rate")
        .offset(100).limit(50)),

    // §2.7: unionByName of heterogeneous sources (excel_extractor.py:28)
    "set_union_by_name" -> ((s, d) => {
      val sup = Tables.load(s, d, "supplier").select(col("s_name").as("name"),
        lit("supplier").as("kind"), pround(col("s_acctbal"), 2).as("bal"))
      val cust = Tables.load(s, d, "customer").select(col("c_name").as("name"),
        lit("customer").as("kind"), pround(col("c_acctbal"), 2).as("bal"))
      sup.unionByName(cust)
    }),

    // F1/F5/F6/F3/F18: scalar normalization pack (SURVEY §2.8)
    "f_norm_pack" -> ((s, d) => {
      val p = Tables.load(s, d, "part")
      val synthDate = when(col("p_partkey") % 4 === 0, "2024-05-17")
        .when(col("p_partkey") % 4 === 1, "2024/06")
        .when(col("p_partkey") % 4 === 2, "20240815")
        .otherwise("garbage")
      val synthPhone = when(col("p_partkey") % 3 === 0, "(404) 555-1234")
        .when(col("p_partkey") % 3 === 1, "none")
        .otherwise(lit(null).cast("string"))
      p.select(col("p_partkey"),
        slugify(col("p_name")).as("slug_name"),
        normCode(col("p_type")).as("code_norm"),
        normZip((col("p_partkey") * 7919).cast("string")).as("zip5"),
        normalizeYymm(synthDate).as("year_month"),
        phoneClean(synthPhone).as("phone"))
    }),

    // F2: deterministic uid minting (pos_set_id, pg_uid, fact_uid);
    // uids staged as attributes so each md5 is minted exactly once
    "f2_uid_mint" -> ((s, d) => {
      val r = rates(s, d)
      val p = providers(s, d)
      r.join(broadcast(p),
          r("provider_reference_id") === p("provider_group_id"), "left")
        .withColumn("pos_members", posMembers(col("service_codes")))
        .withColumn("pos_set_id", posSetId(col("pos_members")))
        .withColumn("pg_uid", pgUid(col("payer_slug"), lit("1.0.0"),
          col("provider_reference_id"), col("provider_reference_id")))
        .select(r("l_orderkey"), r("l_linenumber"),
          col("pos_set_id"), col("pg_uid"),
          factUid(col("state"), col("year_month"), col("payer_slug"),
            col("billing_class"), col("code_type"), col("billing_code"),
            col("pg_uid"), col("pos_set_id"), col("negotiated_type"),
            col("negotiation_arrangement"), col("expiration_date"),
            col("negotiated_rate"), col("provider_reference_id")).as("fact_uid"))
    }),

    // §2.9: CPT categorizer when-chain (categorizer.py:69-254)
    "f_categorize" -> ((s, d) => {
      val code = when(col("p_partkey") % 50 === 0, "G0008")
        .when(col("p_partkey") % 77 === 0, "IME01")
        .when(col("p_partkey") % 88 === 0, "ABC")
        .otherwise((lit(10000) + (col("p_partkey") * 37) % 90000).cast("string"))
      // Staged projections, not one select: passing the `code` CASE
      // directly into the ~40-branch categorizer inlines it into every
      // branch (and the struct into every getField) — the generated
      // method blows janino's 64 KB limit and the whole projection
      // falls back to interpreted. As separate projections,
      // CollapseProject keeps non-cheap exprs referenced more than
      // once un-merged, so codegen computes `code` and the category
      // struct once per row each.
      Tables.load(s, d, "part")
        .select(col("p_partkey"), code.as("code"))
        .select(col("p_partkey"), col("code"),
          Categorizer.categorize(col("code")).as("_cat"))
        .select(col("p_partkey"), col("code"),
          col("_cat").getField("proc_set").as("proc_set"),
          col("_cat").getField("proc_class").as("proc_class"),
          col("_cat").getField("proc_group").as("proc_group"))
    }),

    // §3.2: full star fact build (ETL_1.py:406-443). Staged projections:
    // each md5 uid is minted once as a materialized attribute rather than
    // re-expanded inside every consumer expression (keeps generated
    // methods small enough for whole-stage codegen).
    "star_fact_build" -> ((s, d) => {
      val r = rates(s, d)
      val p = providers(s, d)
      r.join(broadcast(p),
          r("provider_reference_id") === p("provider_group_id"), "left")
        .withColumn("pos_members", posMembers(col("service_codes")))
        .withColumn("pos_set_id", posSetId(col("pos_members")))
        .withColumn("pg_uid", pgUid(col("payer_slug"), lit("1.0.0"),
          col("provider_reference_id"), col("provider_reference_id")))
        .select(
          factUid(col("state"), col("year_month"), col("payer_slug"),
            col("billing_class"), col("code_type"), col("billing_code"),
            col("pg_uid"), col("pos_set_id"), col("negotiated_type"),
            col("negotiation_arrangement"), col("expiration_date"),
            col("negotiated_rate"), col("provider_reference_id")).as("fact_uid"),
          col("state"), col("year_month"), col("payer_slug"),
          col("billing_class"), col("code_type"),
          col("billing_code").as("code"), col("pg_uid"),
          col("pos_set_id"), col("negotiated_type"),
          col("negotiation_arrangement"), col("negotiated_rate"),
          expirationSentinel(col("expiration_date")).as("expiration_date"),
          col("provider_reference_id").as("provider_group_id_raw"))
        // Full-row distinct, NOT dropDuplicates("fact_uid") (r16): the
        // keyed form plans as SortAggregate (first() buffers over 13
        // string columns are not hash-aggregable), paying a full-width
        // sort on BOTH sides of the exchange; grouping by all columns
        // plans as a sort-free HashAggregate. Row-identical: fact_uid
        // is an md5 over every other column's preimage (and the oracle
        // is already SELECT DISTINCT), so per-uid groups are
        // homogeneous and both forms keep exactly one row per uid.
        // Same trick as StarSchemaBuilder.fact.
        .distinct()
    })
  )

  // ------------------------------------------------------------- oracles

  /** md5 literals for the finite service_codes corpus (the SQL twin of
    * posMembers∘posSetId over the synthesized values). Case 4's value
    * "['n','u','l']" fails JSON parse (single quotes) and goes through
    * the [;,|\s]+ split, exactly as in prod_etl/ETL_1.py:109-145. */
  private val posIdSql: String = {
    val garbage = Seq("'l']", "'u'", "['n'").mkString("|") // sorted split tokens
    s"""CASE l_linenumber
        WHEN 1 THEN md5('02|11') WHEN 2 THEN md5('none')
        WHEN 3 THEN md5('11|22') WHEN 4 THEN md5(${lit_(garbage)})
        WHEN 5 THEN md5('02|11|31') ELSE md5('none') END"""
  }

  private val pgUidSql =
    "md5(payer_slug || '|' || '1.0.0' || '|' || provider_reference_id || '|' || provider_reference_id)"

  private def factUidSql(posId: String, pgUid: String) = {
    def co(x: String) = s"coalesce(CAST($x AS VARCHAR), '')"
    "md5(" + Seq(co("state"), co("year_month"), co("payer_slug"),
      co("billing_class"), co("code_type"), co("billing_code"), co(pgUid),
      co(posId), co("negotiated_type"), co("negotiation_arrangement"),
      co("expiration_date"), "printf('%.4f', negotiated_rate)",
      co("provider_reference_id")).mkString(" || '|' || ") + ")"
  }

  def oracles: Map[String, String] = {
    val (catSet, catCls, catGrp) = Categorizer.sqlCase("code")
    Map(
      "s4_tolerant_scan" ->
        "SELECT l_orderkey, l_quantity, CAST(NULL AS VARCHAR) AS negotiated_type FROM lineitem",

      "p3_code_inset" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
        WHERE billing_code IN ('17','42','100','417','998','1500')""",

      "p4_p6_quality_filter" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
        WHERE provider_reference_id IS NOT NULL
          AND negotiated_rate BETWEEN 0.01 AND 50000
          AND billing_class = 'professional'""",

      "p7_contains_any" -> """
        SELECT p_partkey, p_name, p_type FROM part
        WHERE lower(p_type) LIKE '%small%' OR lower(p_type) LIKE '%large%'
           OR lower(p_type) LIKE '%promo%'""",

      "p9_row_dedup" ->
        "SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status FROM lineitem",

      "w1_latest_dedup" -> """
        SELECT l_orderkey, strftime(l_shipdate, '%Y-%m-%d') AS last_updated,
               l_linenumber, l_extendedprice AS rate
        FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                ORDER BY l_shipdate DESC, l_linenumber DESC,
                         l_extendedprice DESC) AS rn FROM lineitem)
        WHERE rn = 1""",

      "w2_top1_per_key" -> """
        SELECT p_brand, p_partkey, p_retailprice
        FROM (SELECT *, row_number() OVER (PARTITION BY p_brand
                ORDER BY p_retailprice DESC, p_partkey ASC) AS rn FROM part)
        WHERE rn = 1""",

      "j1_enrich_left" -> s"""$RP
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate,
               provider_name, state
        FROM rates LEFT JOIN providers
          ON rates.provider_reference_id = providers.provider_group_id""",

      "j2_coalesce_backfill" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code,
               floor((coalesce(wc_rate, negotiated_rate)) * 100.0 + 0.5) / 100.0
                 AS final_rate
        FROM rates LEFT JOIN (
          SELECT CAST(p_partkey AS VARCHAR) AS wc_code,
                 floor((p_retailprice * 0.9) * 100.0 + 0.5) / 100.0 AS wc_rate
          FROM part WHERE p_size % 3 = 0) wc
        ON billing_code = wc_code""",

      "p8_notin_filter" -> """
        SELECT p_partkey, p_brand FROM part
        WHERE p_brand NOT IN ('Brand#11','Brand#22','Brand#33')""",

      "f20_explode_pos" -> s"""$R, sets AS (
          SELECT DISTINCT $posIdSql AS pos_set_id,
            CASE l_linenumber
              WHEN 1 THEN ['02','11'] WHEN 3 THEN ['11','22']
              WHEN 4 THEN ['''l'']', '''u''', '[''n''']
              WHEN 5 THEN ['02','11','31']
              ELSE CAST([] AS VARCHAR[]) END AS members
          FROM rates)
        SELECT pos_set_id, unnest(members) AS pos FROM sets""",

      "j4_keyframe_chain" -> """
        SELECT l_orderkey, l_linenumber, l_partkey,
               floor((p_retailprice * (1 + p_size / 100.0)) * 100.0 + 0.5) / 100.0 AS medicare_calc
        FROM lineitem LEFT JOIN part ON l_partkey = p_partkey""",

      "j5_lut_lookup" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, lut_rate
        FROM rates LEFT JOIN (
          SELECT upper(trim(CAST(p_partkey % 500 AS VARCHAR))) AS hcpcs_norm,
                 floor((min(p_retailprice)) * 100.0 + 0.5) / 100.0 AS lut_rate
          FROM part GROUP BY 1) lut
        ON upper(trim(billing_code)) = lut.hcpcs_norm""",

      "j7_class_routed_bench" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_class, negotiated_rate,
               CASE WHEN billing_class = 'professional' THEN bench_prof
                    ELSE bench_opps END AS benchmark_rate,
               floor((negotiated_rate / nullif(
                 CASE WHEN billing_class = 'professional' THEN bench_prof
                      ELSE bench_opps END, 0)) * 10000.0 + 0.5) / 10000.0
                 AS pct_of_medicare
        FROM rates
        LEFT JOIN (SELECT CAST(p_partkey AS VARCHAR) AS bp_code,
                          floor((p_retailprice * 0.8) * 100.0 + 0.5) / 100.0 AS bench_prof FROM part) bp
          ON billing_code = bp_code
        LEFT JOIN (SELECT CAST(p_partkey AS VARCHAR) AS bo_code,
                          floor((p_retailprice * 1.1) * 100.0 + 0.5) / 100.0 AS bench_opps FROM part) bo
          ON billing_code = bo_code""",

      "j11_anti_append" -> s"""$R
        SELECT DISTINCT billing_code FROM rates r
        WHERE year_month >= '1995-07' AND NOT EXISTS (
          SELECT 1 FROM rates e
          WHERE e.year_month < '1995-07' AND e.billing_code = r.billing_code)""",

      "j12_upsert" -> s"""$R, grain AS (
          SELECT billing_code, payer_slug, year_month,
                 floor((min(negotiated_rate)) * 100.0 + 0.5) / 100.0 AS rate,
                 md5(billing_code || '|' || payer_slug || '|' || year_month) AS fact_uid
          FROM rates GROUP BY 1, 2, 3),
        e AS (SELECT fact_uid, rate, 'existing' AS src FROM grain
              WHERE year_month <= '1995-12'),
        st AS (SELECT fact_uid, rate, 'stage' AS src FROM grain
               WHERE year_month >= '1995-01')
        SELECT * FROM e
        UNION ALL
        SELECT st.* FROM st
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.fact_uid = st.fact_uid)""",

      "j13_semi_filter" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
        WHERE EXISTS (SELECT 1 FROM part
          WHERE p_size = 11 AND CAST(p_partkey AS VARCHAR) = billing_code)""",

      "a4_rate_summary" -> s"""$R
        SELECT COUNT(*) AS rate_count,
               ${avgS("negotiated_rate")} AS avg_rate,
               ${prS("MIN(negotiated_rate)")} AS min_rate,
               ${prS("MAX(negotiated_rate)")} AS max_rate,
               ${qS("negotiated_rate", "0.5")} AS median_rate,
               COUNT(DISTINCT billing_code) AS unique_codes,
               COUNT(DISTINCT payer_slug) AS unique_payers
        FROM rates
        WHERE billing_class = 'professional'
          AND year_month BETWEEN '1994-01' AND '1996-12'""",

      "a5_payer_stats" -> s"""$R
        SELECT payer_slug, COUNT(*) AS rate_count,
               ${avgS("negotiated_rate")} AS avg_rate,
               ${qS("negotiated_rate", "0.5")} AS median_rate,
               COUNT(DISTINCT billing_code) AS unique_codes
        FROM rates GROUP BY payer_slug
        ORDER BY rate_count DESC, payer_slug LIMIT 3""",

      "a5_procedure_stats" -> s"""$R
        SELECT code_type, billing_code,
               coalesce(p_name, billing_code) AS code_desc,
               COUNT(*) AS rate_count,
               ${avgS("negotiated_rate")} AS avg_rate,
               ${prS("MIN(negotiated_rate)")} AS min_rate,
               ${prS("MAX(negotiated_rate)")} AS max_rate
        FROM rates LEFT JOIN
          (SELECT CAST(p_partkey AS VARCHAR) AS code, p_name FROM part) dim
          ON billing_code = dim.code
        GROUP BY 1, 2, 3
        ORDER BY rate_count DESC, billing_code LIMIT 25""",

      "a6_payer_index" -> s"""$RP
        SELECT payer_slug, state, year_month, COUNT(*) AS rate_count,
               ${avgS("negotiated_rate")} AS avg_rate,
               COUNT(DISTINCT billing_code) AS unique_codes,
               COUNT(DISTINCT provider_group_id) AS unique_provider_groups
        FROM rates LEFT JOIN providers
          ON rates.provider_reference_id = providers.provider_group_id
        GROUP BY 1, 2, 3""",

      "a7_market_profile" -> s"""$R
        SELECT year_month, billing_class,
               COUNT(DISTINCT provider_reference_id) AS n_providers,
               COUNT(*) AS n_rates,
               ${qS("negotiated_rate", "0.10")} AS p10,
               ${qS("negotiated_rate", "0.25")} AS p25,
               ${qS("negotiated_rate", "0.50")} AS p50,
               ${qS("negotiated_rate", "0.75")} AS p75,
               ${qS("negotiated_rate", "0.90")} AS p90,
               ${avgS("negotiated_rate")} AS avg_rate,
               ${prS("MIN(negotiated_rate)")} AS min_rate,
               ${prS("MAX(negotiated_rate)")} AS max_rate
        FROM rates GROUP BY 1, 2""",

      "a8_dim_value_counts" -> s"""
        SELECT event_type, COUNT(*) AS n, ${avgS("value")} AS avg_value
        FROM events GROUP BY 1 ORDER BY n DESC, event_type""",

      "a11_masked_coverage" -> s"""$R
        SELECT COUNT(*) AS total_rows,
               COUNT(CASE WHEN billing_class = 'professional' THEN 1 END) AS prof_rows,
               COUNT(CASE WHEN billing_class = 'institutional' THEN 1 END) AS inst_rows,
               COUNT(CASE WHEN billing_class = 'professional'
                     AND negotiated_rate > 40000 THEN 1 END) AS prof_benchmarked,
               COUNT(CASE WHEN billing_class = 'institutional'
                     AND negotiated_rate > 40000 THEN 1 END) AS inst_benchmarked
        FROM rates""",

      "a12_availability" -> s"""$RP
        SELECT state, year_month, COUNT(*) AS record_count,
               COUNT(DISTINCT payer_slug) AS unique_payers,
               COUNT(DISTINCT billing_code) AS unique_codes
        FROM rates LEFT JOIN providers
          ON rates.provider_reference_id = providers.provider_group_id
        GROUP BY 1, 2""",

      "sort_topk" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
        ORDER BY negotiated_rate DESC, l_orderkey, l_linenumber LIMIT 100""",

      "sort_pagination" -> s"""$R
        SELECT l_orderkey, l_linenumber, billing_code, negotiated_rate FROM rates
        ORDER BY negotiated_rate DESC, l_orderkey, l_linenumber
        LIMIT 50 OFFSET 100""",

      "set_union_by_name" -> """
        SELECT s_name AS name, 'supplier' AS kind,
               floor((s_acctbal) * 100.0 + 0.5) / 100.0 AS bal
        FROM supplier
        UNION ALL
        SELECT c_name AS name, 'customer' AS kind,
               floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS bal
        FROM customer""",

      "f_norm_pack" -> """
        SELECT p_partkey,
          regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'),
                         '^_+|_+$', '', 'g') AS slug_name,
          upper(trim(p_type)) AS code_norm,
          CASE WHEN regexp_replace(CAST(p_partkey * 7919 AS VARCHAR),
                                   '[^0-9]', '', 'g') = '' THEN NULL
               ELSE lpad(substr(regexp_replace(CAST(p_partkey * 7919 AS VARCHAR),
                                               '[^0-9]', '', 'g'), 1, 5), 5, '0')
          END AS zip5,
          CASE WHEN regexp_extract(sd, '(20[0-9]{2})[-/](0[1-9]|1[0-2])', 1) <> ''
               THEN regexp_extract(sd, '(20[0-9]{2})[-/](0[1-9]|1[0-2])', 1)
                    || '-' ||
                    regexp_extract(sd, '(20[0-9]{2})[-/](0[1-9]|1[0-2])', 2)
               ELSE '' END AS year_month,
          nullif(regexp_replace(sp, '[^0-9]', '', 'g'), '') AS phone
        FROM (SELECT p_partkey, p_name, p_type,
                CASE WHEN p_partkey % 4 = 0 THEN '2024-05-17'
                     WHEN p_partkey % 4 = 1 THEN '2024/06'
                     WHEN p_partkey % 4 = 2 THEN '20240815'
                     ELSE 'garbage' END AS sd,
                CASE WHEN p_partkey % 3 = 0 THEN '(404) 555-1234'
                     WHEN p_partkey % 3 = 1 THEN 'none'
                     ELSE NULL END AS sp
              FROM part)""",

      "f2_uid_mint" -> s"""$RP
        SELECT l_orderkey, l_linenumber, $posIdSql AS pos_set_id,
               $pgUidSql AS pg_uid,
               ${factUidSql(posIdSql, pgUidSql)} AS fact_uid
        FROM rates LEFT JOIN providers
          ON rates.provider_reference_id = providers.provider_group_id""",

      "f_categorize" -> s"""
        SELECT p_partkey, code,
               ($catSet) AS proc_set, ($catCls) AS proc_class,
               ($catGrp) AS proc_group
        FROM (SELECT p_partkey,
                CASE WHEN p_partkey % 50 = 0 THEN 'G0008'
                     WHEN p_partkey % 77 = 0 THEN 'IME01'
                     WHEN p_partkey % 88 = 0 THEN 'ABC'
                     ELSE CAST(10000 + (p_partkey * 37) % 90000 AS VARCHAR)
                END AS code
              FROM part)""",

      "star_fact_build" -> s"""$RP
        SELECT DISTINCT
               ${factUidSql(posIdSql, pgUidSql)} AS fact_uid,
               state, year_month, payer_slug, billing_class, code_type,
               billing_code AS code, $pgUidSql AS pg_uid,
               $posIdSql AS pos_set_id, negotiated_type,
               negotiation_arrangement, negotiated_rate,
               CASE WHEN expiration_date = '9999-12-31' THEN NULL
                    ELSE expiration_date END AS expiration_date,
               provider_reference_id AS provider_group_id_raw
        FROM rates LEFT JOIN providers
          ON rates.provider_reference_id = providers.provider_group_id"""
    )
  }
}
