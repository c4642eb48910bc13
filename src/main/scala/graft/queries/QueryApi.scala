package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Roles, Tables}
import graft.functions.NormExprs._

/** The webapp's parameterized filter grammar (SURVEY §3.3;
  * webapp/backend/main.py:100-156): state + year_month mandatory,
  * everything else optional — and, like the reference, optional
  * predicates/joins are added to the plan ONLY when the parameter is
  * present (J14 conditional plan building,
  * webapp/backend/main.py:117-125).
  *
  * Catalyst then prunes/pushes the present predicates into the scan;
  * the absent ones never exist in the plan, so there is no "WHERE 1=1"
  * residue to optimize away.
  */
object QueryApi {

  /** Filter grammar of GET /api/rates/summary and friends. */
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
    maxRate: Option[Double] = None)

  /** Apply the grammar: mandatory predicates, then each optional one
    * only if present; the provider join is attached only when a
    * provider-side filter needs it. */
  def filteredRates(spark: SparkSession, dir: String,
                    f: RateFilter): DataFrame = {
    var df = Roles.rates(spark, dir)
      .filter(col("year_month") === f.yearMonth)
    val opts: Seq[Option[Column]] = Seq(
      f.payerIlike.map(q => lower(col("payer_slug")).contains(q.toLowerCase)),
      f.code.map(col("billing_code") === _),
      f.billingClass.map(col("billing_class") === _),
      f.negotiatedType.map(col("negotiated_type") === _),
      f.minRate.map(col("negotiated_rate") >= _),
      f.maxRate.map(col("negotiated_rate") <= _))
    df = opts.flatten.foldLeft(df)(_ filter _)
    // state lives on the provider dim; the join (and with it the state
    // predicate) is attached only when needed — J14's exact shape
    val needProviders = f.providerGroup.isDefined || f.state.nonEmpty
    if (needProviders) {
      val p = Roles.providers(spark, dir)
      df = df.join(broadcast(p),
        df("provider_reference_id") === p("provider_group_id"), "left")
      if (f.state.nonEmpty) df = df.filter(col("state") === f.state)
      f.providerGroup.foreach(g =>
        df = df.filter(col("provider_group_id") === g))
    }
    // TIN filter: attach the xref join ONLY when a tin_value is present
    // (webapp/backend/main.py:117-125 appends the JOIN to base_from the
    // same way). Inner join = the filter; the xref is a bounded dim.
    f.tinValue.foreach { tin =>
      val x = graft.etl.EnrichmentDims
        .xrefPgMemberTin(Roles.providers(spark, dir))
        .filter(col("tin_value") === tin)
        .select(col("provider_group_id").as("tin_pgid"))
      df = df.join(broadcast(x), df("provider_reference_id") === col("tin_pgid"))
        .drop("tin_pgid")
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
}
