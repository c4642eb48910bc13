package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Roles, Tables}
import graft.functions.NormExprs._

/** The webapp's parameterized filter grammar (SURVEY §3.3;
  * webapp/backend/main.py:100-156), including the consolidated
  * dashboard's MULTI-SELECT extension: every filter field can carry a
  * comma-separated value list that becomes an IN predicate
  * (webapp/consolidated_dashboard.py:139-160 parses the lists;
  * webapp/staged_dashboard.py:167-180,346-347 builds the
  * `IN (?,?,…)` clauses, including on NPPES-dim fields). state +
  * year_month mandatory, everything else optional — and, like the
  * reference, optional predicates/joins are added to the plan ONLY
  * when the parameter is present (J14 conditional plan building,
  * webapp/backend/main.py:117-125).
  *
  * Catalyst then prunes/pushes the present predicates into the scan
  * (an IN over partition/data columns pushes down exactly like
  * equality); the absent ones never exist in the plan, so there is no
  * "WHERE 1=1" residue to optimize away. Dim-side multi-selects
  * (taxonomy, NPI, enumeration type) attach ONE broadcast semi-join
  * against the filtered NPPES dim — never a second scan of the fact.
  */
object QueryApi {

  /** Filter grammar of GET /api/rates/summary, /api/search/multi-field
    * and friends. Single-valued fields keep their original equality
    * semantics; the Seq fields are the multi-selects (empty = absent).
    * A single value and a one-element list are equivalent. */
  final case class RateFilter(
    state: String,
    yearMonth: String,
    payerIlike: Option[String] = None,
    code: Option[String] = None,
    billingClass: Option[String] = None,
    negotiatedType: Option[String] = None,
    providerGroup: Option[String] = None, // triggers the provider join (J14)
    tinValue: Option[String] = None, // triggers the TIN xref join (main.py:117-125)
    minRate: Option[Double] = None,
    maxRate: Option[Double] = None,
    // multi-selects (consolidated_dashboard.py:139-160)
    states: Seq[String] = Nil,
    codes: Seq[String] = Nil,
    billingClasses: Seq[String] = Nil,
    negotiatedTypes: Seq[String] = Nil,
    payers: Seq[String] = Nil, // exact payer_slug IN (staged_dashboard.py:167-180)
    tinValues: Seq[String] = Nil,
    taxonomies: Seq[String] = Nil, // NPPES primary_taxonomy_desc IN (staged_dashboard.py:346-347)
    npis: Seq[String] = Nil,
    enumerationTypes: Seq[String] = Nil,
    // OR-of-ILIKE lists (optimized_queries.py:579-588's
    // build_ilike_clause): each value is a case-insensitive CONTAINS,
    // any match passes
    payerIlikes: Seq[String] = Nil,
    orgIlikes: Seq[String] = Nil) // NPPES organization_name ILIKE any

  /** The dashboard's comma-separated multi-select decoding
    * (consolidated_dashboard.py:139-144): split, trim, drop empties —
    * `"a, b,,c"` → `Seq("a","b","c")`; null/blank → absent. */
  def parseMulti(raw: String): Seq[String] =
    Option(raw).toSeq
      .flatMap(_.split(",", -1).iterator.map(_.trim).filter(_.nonEmpty))

  /** Apply the grammar: mandatory predicates, then each optional one
    * only if present; each dim join is attached only when a filter on
    * that dim's side needs it. Single + multi values of the same field
    * merge into one IN set. */
  def filteredRates(spark: SparkSession, dir: String,
                    f: RateFilter): DataFrame = {
    var df = Roles.rates(spark, dir)
      .filter(col("year_month") === f.yearMonth)
    def inSet(c: Column, vs: Seq[String]): Option[Column] =
      if (vs.isEmpty) None else Some(c.isin(vs: _*))
    def anyIlike(c: Column, vs: Seq[String]): Option[Column] =
      if (vs.isEmpty) None
      else Some(vs.map(q => lower(c).contains(q.toLowerCase)).reduce(_ || _))
    val opts: Seq[Option[Column]] = Seq(
      f.payerIlike.map(q => lower(col("payer_slug")).contains(q.toLowerCase)),
      anyIlike(col("payer_slug"), f.payerIlikes),
      inSet(col("billing_code"), f.code.toSeq ++ f.codes),
      inSet(col("billing_class"), f.billingClass.toSeq ++ f.billingClasses),
      inSet(col("negotiated_type"),
        f.negotiatedType.toSeq ++ f.negotiatedTypes),
      inSet(col("payer_slug"), f.payers),
      f.minRate.map(col("negotiated_rate") >= _),
      f.maxRate.map(col("negotiated_rate") <= _))
    df = opts.flatten.foldLeft(df)(_ filter _)
    // state lives on the provider dim; the join (and with it the state
    // predicate) is attached only when needed — J14's exact shape
    val stateSet = (if (f.state.nonEmpty) Seq(f.state) else Nil) ++ f.states
    val needProviders = f.providerGroup.isDefined || stateSet.nonEmpty
    if (needProviders) {
      val p = Roles.providers(spark, dir)
      df = df.join(broadcast(p),
        df("provider_reference_id") === p("provider_group_id"), "left")
      if (stateSet.nonEmpty) df = df.filter(col("state").isin(stateSet: _*))
      f.providerGroup.foreach(g =>
        df = df.filter(col("provider_group_id") === g))
    }
    // TIN filter: attach the xref join ONLY when tin values are present
    // (webapp/backend/main.py:117-125 appends the JOIN to base_from the
    // same way). Broadcast semi = the filter; the xref is a bounded dim.
    val tins = f.tinValue.toSeq ++ f.tinValues
    if (tins.nonEmpty) {
      val x = graft.etl.EnrichmentDims
        .xrefPgMemberTin(Roles.providers(spark, dir))
        .filter(col("tin_value").isin(tins: _*))
        .select(col("provider_group_id").as("tin_pgid"))
      df = df.join(broadcast(x), df("provider_reference_id") === col("tin_pgid"))
        .drop("tin_pgid")
    }
    // NPPES-side multi-selects: ONE semi-join against the dim filtered
    // by every present NPPES predicate (staged_dashboard.py:330-347
    // appends taxonomy IN clauses to the joined NPPES table the same
    // way). Semi, not inner: the dim is 1:1 per group id here, but the
    // filter contract must not depend on that.
    if (f.taxonomies.nonEmpty || f.npis.nonEmpty ||
        f.enumerationTypes.nonEmpty || f.orgIlikes.nonEmpty) {
      var dim = graft.etl.EnrichmentDims.dimNpi(Roles.providers(spark, dir))
      Seq(inSet(col("primary_taxonomy_desc"), f.taxonomies),
          inSet(col("npi"), f.npis),
          inSet(col("enumeration_type"), f.enumerationTypes),
          // ILIKE on a NULL organization_name is NULL → excluded,
          // exactly the reference's semantics for person-type NPIs
          anyIlike(col("organization_name"), f.orgIlikes))
        .flatten.foreach(p => dim = dim.filter(p))
      df = df.join(broadcast(dim.select(col("npi").as("nppes_pgid"))),
        df("provider_reference_id") === col("nppes_pgid"), "left_semi")
    }
    df
  }

  /** A4-style summary over the filtered set (data_queries.py:96-107).
    * Distinct count via collect_set — the exact-percentile buffer
    * already forces an ObjectHashAggregate over every value, so the
    * set adds no new memory class but removes the countDistinct
    * Expand. */
  def rateSummary(spark: SparkSession, dir: String, f: RateFilter): DataFrame =
    filteredRates(spark, dir, f).agg(
      count(lit(1)).as("rate_count"),
      pround(sum(col("negotiated_rate").cast("decimal(18,2)")).cast("double") /
        count(col("negotiated_rate")), 2).as("avg_rate"),
      pround(min(col("negotiated_rate")), 2).as("min_rate"),
      pround(max(col("negotiated_rate")), 2).as("max_rate"),
      pround(percentile(col("negotiated_rate"), lit(0.5)), 2).as("median_rate"),
      size(collect_set(col("billing_code"))).cast("long").as("unique_codes"))

  /** The same grammar over a MATERIALIZED star fact (the
    * StarSchemaBuilder layout): state/year_month/payer/class live in
    * the hive partition path, so their predicates — including the
    * multi-select IN lists — prune AT FILE LISTING, and the data-side
    * INs (codes, types) push into the parquet scan, which the
    * role-view variant cannot offer (its filter columns are derived
    * expressions). Fact-side filters only: dim-side predicates (TIN,
    * NPPES, provider group) belong to [[filteredRates]], which owns
    * the joins. `fact` must be rates-shaped on the filtered columns
    * (rename `code` → `billing_code` on read). */
  def filteredFact(fact: DataFrame, f: RateFilter): DataFrame = {
    def inSet(c: Column, vs: Seq[String]): Option[Column] =
      if (vs.isEmpty) None else Some(c.isin(vs: _*))
    val stateSet = (if (f.state.nonEmpty) Seq(f.state) else Nil) ++ f.states
    val opts: Seq[Option[Column]] = Seq(
      Some(col("year_month") === f.yearMonth),
      inSet(col("state"), stateSet),
      f.payerIlike.map(q => lower(col("payer_slug")).contains(q.toLowerCase)),
      inSet(col("payer_slug"), f.payers),
      inSet(col("billing_code"), f.code.toSeq ++ f.codes),
      inSet(col("billing_class"), f.billingClass.toSeq ++ f.billingClasses),
      inSet(col("negotiated_type"),
        f.negotiatedType.toSeq ++ f.negotiatedTypes),
      f.minRate.map(col("negotiated_rate") >= _),
      f.maxRate.map(col("negotiated_rate") <= _))
    opts.flatten.foldLeft(fact)(_ filter _)
  }

  /** The consolidated dashboard's multi-field search result shape:
    * matching rate rows, highest first, deterministically tie-broken
    * by the row key so a LIMIT is the same set on any engine
    * (simple_queries.py:16-202 orders by negotiated_rate DESC). */
  def multiFieldSearch(spark: SparkSession, dir: String, f: RateFilter,
                       limit: Int = 100): DataFrame =
    filteredRates(spark, dir, f)
      .select(col("l_orderkey"), col("l_linenumber"), col("billing_code"),
        pround(col("negotiated_rate"), 2).as("negotiated_rate"),
        col("payer_slug"), col("billing_class"), col("negotiated_type"))
      .orderBy(col("negotiated_rate").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(limit)
}
