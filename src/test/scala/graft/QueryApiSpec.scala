package graft

import org.apache.spark.sql.functions._
import graft.queries.QueryApi
import graft.queries.QueryApi.RateFilter

/** The parameterized filter grammar: multi-select decoding, J14
  * conditional plan building (absent params leave NO residue in the
  * plan — no join, no predicate), and single+multi merge semantics. */
class QueryApiSpec extends SparkSpec {

  test("parseMulti decodes the dashboard's comma grammar") {
    assert(QueryApi.parseMulti("a, b,,c ") == Seq("a", "b", "c"))
    assert(QueryApi.parseMulti(null) == Nil)
    assert(QueryApi.parseMulti("") == Nil)
    assert(QueryApi.parseMulti(" , ,") == Nil)
    assert(QueryApi.parseMulti("one") == Seq("one"))
  }

  test("absent optional params leave no joins in the plan; present ones attach exactly theirs") {
    val bare = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09"))
      .queryExecution.optimizedPlan
    assert(bare.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "param-free filter must be a bare scan+filter")
    val withDims = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09",
        taxonomies = Seq("Taxonomy 3"), tinValues = Seq("EIN000000003")))
      .queryExecution.optimizedPlan
    val joins = withDims.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.count(_.sql.contains("SEMI")) >= 1,
      s"NPPES multi-select should attach a semi join, got $joins")
  }

  test("a single value and a one-element list filter identically; lists merge") {
    val single = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09", code = Some("5")))
      .count()
    val listed = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09", codes = Seq("5")))
      .count()
    assert(single == listed, "Some(v) and Seq(v) diverged")
    val merged = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09",
        code = Some("5"), codes = Seq("7", "11")))
      .select("billing_code").distinct().collect()
      .map(_.getString(0)).toSet
    assert(merged.subsetOf(Set("5", "7", "11")),
      s"merged IN set leaked other codes: $merged")
    // multi-select beyond the fixture's value space is a no-op filter,
    // not an error
    val absent = QueryApi.filteredRates(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09",
        codes = Seq("no_such_code")))
      .count()
    assert(absent == 0L)
  }

  test("gold-fact grammar: partition INs prune at listing, data INs push to parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft_api_gold")
      .toString + "/fact"
    graft.etl.StarSchemaBuilder.writePartitionedFact(spark,
      graft.etl.StarSchemaBuilder.fact(
        graft.etl.StarSchemaBuilder.base(spark, sf0001)), out)
    val fact = spark.read.parquet(out)
      .withColumnRenamed("code", "billing_code")
    val plan = QueryApi.filteredFact(fact, RateFilter(
        state = "", yearMonth = "1995-09",
        states = Seq("NATION_3", "NATION_9"),
        payers = Seq("payer_1", "payer_3"),
        negotiatedTypes = Seq("negotiated", "fee schedule"),
        minRate = Some(50.0)))
      .queryExecution.executedPlan.toString
    assert(plan.matches(
      "(?s).*PartitionFilters: \\[[^\\]]*state[^\\]]*IN[^\\]]*\\].*"),
      s"state IN not a partition filter:\n${plan.take(1500)}")
    assert(plan.contains("PushedFilters:") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(negotiated_type[^\\]]*\\].*"),
      s"negotiated_type IN not pushed to parquet:\n${plan.take(1500)}")
  }

  test("multiFieldSearch ranks highest-rate-first with a total tie-break") {
    val rows = QueryApi.multiFieldSearch(spark, sf0001,
      RateFilter(state = "", yearMonth = "1995-09",
        billingClasses = Seq("professional", "institutional")), limit = 50)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val rates = rows.map(_.getAs[Double]("negotiated_rate")).toSeq
    assert(rates == rates.sorted.reverse, "rows not rate-descending")
  }
}
