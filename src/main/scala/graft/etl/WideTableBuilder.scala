package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Roles
import graft.functions.{Categorizer, NormExprs}
import graft.functions.NormExprs.{normZip, pctOfMedicare, pround}

/** The legacy wide-table pipeline (SURVEY §3.1): the reference's
  * original 13-phase ETL (main.py:54-164) composed from the operator
  * inventory, in the reference's order:
  *
  *   1. extract & merge rates ⋈ providers      (S1+S3 → J1)
  *   2. billing-code IN-set filter             (S5 → P3)
  *   3. column rename (guarded)                (P1)
  *   4. column drop (ignore-missing)           (P2)
  *   5. GA-WC columns initialize               (F13 init)
  *   6. NPPES enrichment join                  (J3)
  *   7. state filter                           (P5)
  *   8. geocode stand-in: address → zip5       (S9 shape; HTTP out-of-band)
  *   9. NPPES cleanup drop                     (P2)
  *  10. GA-WC merge + coalesce backfill        (J2+F13)
  *  11. procedure categorization (when-chain — the legacy path
  *      categorizes inline, not via the crosswalk dim)   (§2.9)
  *  12. class-routed Medicare benchmark join + pct       (J7+F12)
  *  13. load                                   (S11)
  *
  * Scale notes: one pass over the fact; every lookup side (providers,
  * dim_npi, addresses, GA-WC, benchmarks) is a bounded dim and joins
  * broadcast, so the fact never shuffles — the whole build is
  * scan → broadcast-join chain → sink, embarrassingly parallel.
  */
object WideTableBuilder {

  def build(spark: SparkSession, dir: String, codes: Seq[String],
            state: String): DataFrame = {
    // 1: extract & merge
    val r = Roles.rates(spark, dir)
    val p = Roles.providers(spark, dir)
    val merged = r.join(broadcast(p),
      r("provider_reference_id") === p("provider_group_id"), "left")
    // 2: billing-code filter
    val filtered = merged.filter(col("billing_code").isin(codes: _*))
    // 3+4: guarded rename, drop ignore-missing
    val renames = Map("billing_code" -> "code", "negotiated_rate" -> "rate",
      "not_a_column" -> "ghost")
    val present = renames.filter { case (k, _) => filtered.columns.contains(k) }
    val drops = Seq("service_codes", "negotiation_arrangement", "l_suppkey",
      "also_missing")
    val cleaned = filtered.withColumnsRenamed(present).drop(drops: _*)
    // 5: GA-WC init
    val gaInit = cleaned
      .withColumn("wc_rate", lit(null).cast("double"))
      .withColumn("wc_state", lit(null).cast("string"))
    // 6: NPPES enrichment
    val npi = EnrichmentDims.dimNpi(p).select(col("npi"),
      col("status").as("nppes_status"),
      col("primary_taxonomy_code"), col("primary_taxonomy_desc"))
    val enriched = gaInit.join(broadcast(npi),
      gaInit("provider_reference_id") === npi("npi"), "left")
    // 7: state filter
    val stateFiltered = enriched.filter(col("state") === state)
    // 8: geocode stand-in — LOCATION address → zip5
    val loc = EnrichmentDims.dimNpiAddress(p)
      .filter(col("address_purpose") === "LOCATION")
      .select(col("npi").as("addr_npi"), col("postal_code"))
    val geocoded = stateFiltered.join(broadcast(loc),
        col("provider_reference_id") === col("addr_npi"), "left")
      .withColumn("zip5", normZip(col("postal_code")))
    // 9: NPPES cleanup
    val nppesCleaned = geocoded.drop("npi", "addr_npi", "postal_code",
      "nppes_status")
    // 10: GA-WC merge + coalesce
    val gaWc = graft.Tables.load(spark, dir, "part")
      .filter(col("p_size") % 3 === 0)
      .select(col("p_partkey").cast("string").as("wc_code"),
        pround(col("p_retailprice") * 0.9, 2).as("wc_rate_new"))
    val gaMerged = nppesCleaned.join(broadcast(gaWc),
        col("code") === col("wc_code"), "left")
      .withColumn("final_rate",
        pround(coalesce(col("wc_rate_new"), col("wc_rate"), col("rate")), 2))
      .drop("wc_code", "wc_rate", "wc_rate_new", "wc_state")
    // 11: categorize (legacy inline when-chain). Stage the struct in
    // its own projection: three getFields over an inline categorize
    // would triplicate the ~40-branch chain in one generated method.
    val categorized = gaMerged
      .withColumn("_cat", Categorizer.categorize(col("code")))
      .withColumn("proc_set", col("_cat").getField("proc_set"))
      .withColumn("proc_class", col("_cat").getField("proc_class"))
      .withColumn("proc_group", col("_cat").getField("proc_group"))
      .drop("_cat")
    // 12: class-routed benchmark + pct_of_medicare
    val part = graft.Tables.load(spark, dir, "part")
    val bp = part.select(col("p_partkey").cast("string").as("bp_code"),
      pround(col("p_retailprice") * 0.8, 2).as("bench_prof"))
    val bo = part.select(col("p_partkey").cast("string").as("bo_code"),
      pround(col("p_retailprice") * 1.1, 2).as("bench_opps"))
    val bench = when(col("billing_class") === "professional",
      col("bench_prof")).otherwise(col("bench_opps"))
    categorized
      .join(broadcast(bp), col("code") === col("bp_code"), "left")
      .join(broadcast(bo), col("code") === col("bo_code"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("code"),
        col("rate"), col("billing_class"), col("state"),
        col("provider_name"), col("primary_taxonomy_code"),
        col("primary_taxonomy_desc"), col("zip5"), col("final_rate"),
        col("proc_set"), col("proc_class"), col("proc_group"),
        bench.as("benchmark_rate"),
        pround(pctOfMedicare(col("rate"), bench), 4).as("pct_of_medicare"))
  }

  /** Phase 13: load (zstd parquet, S11). */
  def run(spark: SparkSession, dir: String, codes: Seq[String],
          state: String, outPath: String): Unit =
    build(spark, dir, codes, state).write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(outPath)
}
