package graft

import org.apache.spark.sql.functions._
import graft.etl.GoldAggregates
import graft.sources.SkewTools

/** Skew-salting equivalence + the approx gold-aggregate accuracy
  * envelope (the two documented 100 TB opt-ins). */
class SkewSpec extends SparkSpec {

  test("salted join returns exactly the unsalted join's rows") {
    val r = Roles.rates(spark, sf0001)
    // deliberately skewed fact: every third row collapses to one key
    val fact = r.select(
      when(col("l_orderkey") % 3 === 0, "HOT")
        .otherwise(col("billing_code")).as("code"),
      col("l_orderkey"), col("l_linenumber"), col("negotiated_rate"))
    val dim = Tables.load(spark, sf0001, "part")
      .select(col("p_partkey").cast("string").as("code"),
        col("p_name").as("code_desc"))
      .unionByName(spark.sql("SELECT 'HOT' AS code, 'hot desc' AS code_desc"))
    val cols = Seq("code", "l_orderkey", "l_linenumber",
      "negotiated_rate", "code_desc")
    val plain = fact.join(dim, Seq("code"), "left")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val salted = SkewTools.saltedJoin(fact, dim, "code", 8)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(salted == plain, s"${salted.size} vs ${plain.size} rows")
  }

  test("applyAdvice: every strategy returns the plain join, right plan") {
    val r = Roles.rates(spark, sf0001)
    val fact = r.select(
      when(col("l_orderkey") % 3 === 0, "HOT")
        .otherwise(col("billing_code")).as("code"),
      col("l_orderkey"), col("l_linenumber"), col("negotiated_rate"))
    val dim = Tables.load(spark, sf0001, "part")
      .select(col("p_partkey").cast("string").as("code"),
        col("p_name").as("code_desc"))
      .unionByName(spark.sql("SELECT 'HOT' AS code, 'hot desc' AS code_desc"))
    val cols = Seq("code", "l_orderkey", "l_linenumber",
      "negotiated_rate", "code_desc")
    val plain = fact.join(dim, Seq("code"), "left")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString

    // the ladder end to end: advise() decides, applyAdvice() rewrites
    val b = SkewTools.advise(hotShareBp = 3000, dimBytes = 1L << 20)
    assert(b.strategy == "broadcast")
    val viaB = SkewTools.applyAdvice(b, fact, dim, "code")
    assert(rows(viaB) == plain)
    assert(plan(viaB).contains("BroadcastHashJoin"),
      "broadcast advice must plan a broadcast join")

    val a = SkewTools.advise(hotShareBp = 100, dimBytes = 1L << 30)
    assert(a.strategy == "aqe")
    assert(rows(SkewTools.applyAdvice(a, fact, dim, "code")) == plain)

    val sa = SkewTools.advise(hotShareBp = 3000, dimBytes = 1L << 30)
    assert(sa.strategy == "salt" && sa.saltN >= 8)
    val viaS = SkewTools.applyAdvice(sa, fact, dim, "code")
    assert(rows(viaS) == plain)
    assert(plan(viaS).contains("ShuffledHashJoin"),
      "salt advice must shuffle on (key, salt), not broadcast")

    intercept[IllegalArgumentException] {
      SkewTools.applyAdvice(SkewTools.SkewAdvice("yolo", 0, ""),
        fact, dim, "code")
    }

    // measure -> decide -> rewrite in one call: the HOT key holds a
    // third of the fact, so with broadcast priced out the measurement
    // itself must drive the ladder to salt — and still match plain
    val (auto, joined) = SkewTools.adviseAndJoin(fact, dim, "code",
      broadcastThresholdBytes = 1L) // price the broadcast rung out
    assert(auto.strategy == "salt" && auto.saltN >= 8, auto.toString)
    assert(rows(joined) == plain)
    // with the default threshold the tiny dim broadcasts instead
    val (auto2, joined2) = SkewTools.adviseAndJoin(fact, dim, "code")
    assert(auto2.strategy == "broadcast", auto2.toString)
    assert(rows(joined2) == plain)
  }

  test("approx gold aggregate stays inside its accuracy envelope") {
    val exact = GoldAggregates.aggMarketRates(spark, sf0001)
      .select("year_month", "state", "payer_slug", "billing_class",
        "code_type", "code", "npi_count", "p50", "min", "max")
    val approx = GoldAggregates.aggMarketRatesApprox(spark, sf0001)
      .select(col("year_month"), col("state"), col("payer_slug"),
        col("billing_class"), col("code_type"), col("code"),
        col("npi_count").as("npi_approx"), col("p50").as("p50_approx"))
    val joined = exact.join(approx, Seq("year_month", "state", "payer_slug",
      "billing_class", "code_type", "code")).cache()
    try {
      assert(joined.count() == exact.count(), "same grain on both sides")
      // HLL at rsd=0.02 on tiny counts is exact in practice; allow 5%
      val badCounts = joined.filter(
        abs(col("npi_count") - col("npi_approx")) >
          greatest(lit(1.0), col("npi_count") * 0.05)).count()
      assert(badCounts == 0, s"$badCounts groups outside HLL envelope")
      // percentile_approx returns an order statistic (no interpolation),
      // so on even-sized groups it differs from the interpolating exact
      // median by up to one neighbor gap. The guarantee to pin: the
      // approx p50 is a real in-range value, and where the group is a
      // single point it is exactly the median.
      val outOfRange = joined.filter(
        col("p50_approx") < col("min") || col("p50_approx") > col("max"))
        .count()
      assert(outOfRange == 0, s"$outOfRange approx medians out of range")
      val badSingleton = joined.filter(col("min") === col("max") &&
        col("p50_approx") =!= col("p50")).count()
      assert(badSingleton == 0,
        s"$badSingleton single-point groups with wrong approx median")
    } finally joined.unpersist()
  }
}
