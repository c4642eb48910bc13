package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch-operator guarantees that the oracle queries cannot express:
  * merge algebra (the property that makes registers/counters a GOLD
  * layer citizen — batches fold without recompute), estimator branch
  * behavior, one-sided CMS error over the WHOLE domain, and the
  * accuracy/size trade across p.
  */
class SketchesSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf0001, "events")
  private lazy val docs = Tables.load(spark, sf0001, "documents")

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("HLL registers: split-merge equals one-shot, three-way fold too") {
    val dv = events.select(col("event_type"), col("user_id").as("v")).distinct()
    val full = Sketches.hllRegisters(dv, Seq("event_type"), "v")
    // split on a hash coin so both halves carry every key
    val h = abs(hash(col("v"))) % 3
    val parts = (0 to 2).map(i =>
      Sketches.hllRegisters(dv.filter(h === i), Seq("event_type"), "v"))
    val merged2 = Sketches.hllMergeRegisters(Seq("event_type"),
      Sketches.hllMergeRegisters(Seq("event_type"), parts(0), parts(1)),
      parts(2))
    val merged3 = Sketches.hllMergeRegisters(Seq("event_type"), parts: _*)
    assert(canon(merged2) == canon(full), "pairwise fold != one-shot")
    assert(canon(merged3) == canon(full), "n-way merge != one-shot")
    // duplicate ingestion is idempotent: re-folding a batch changes nothing
    val refold = Sketches.hllMergeRegisters(Seq("event_type"), full, parts(1))
    assert(canon(refold) == canon(full), "re-ingesting a batch moved registers")
  }

  test("HLL estimate: LC branch at tiny cardinality, HLL branch when saturated") {
    val dv = events.select(col("event_type"), col("user_id").as("v")).distinct()
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(dv, Seq("event_type"), "v"), Seq("event_type"))
      .join(dv.groupBy("event_type").agg(count(lit(1)).as("exact")),
        "event_type")
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (vZero, e, exact) = (r.getAs[Long]("v_zero"),
        r.getAs[Double]("est_distinct"), r.getAs[Long]("exact"))
      // sf0.001 has ~tens of users per type: far under 2.5m, so v_zero
      // must be large (LC branch) and LC is tight at this load factor
      assert(vZero > 128, s"expected sparse registers, v_zero=$vZero")
      assert(math.abs(e - exact) <= math.max(2.0, 0.15 * exact),
        s"LC estimate $e vs exact $exact")
    }
    // saturate m=16 registers with ~6k distinct ids from lineitem to
    // force the raw-HLL branch (E_raw > 2.5m), still within 2x
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(lit("k").as("k"), col("l_orderkey").as("v")).distinct()
    val r = Sketches.hllEstimate(
      Sketches.hllRegisters(li, Seq("k"), "v", p = 4), Seq("k"), p = 4)
      .collect().head
    val exact = li.count()
    assert(r.getAs[Long]("v_zero") == 0, "16 registers must saturate")
    val e = r.getAs[Double]("est_distinct")
    assert(e > exact / 2.0 && e < exact * 2.0,
      s"raw HLL estimate $e wildly off exact $exact at p=4")
  }

  test("HLL accuracy tightens with p: relative error halves 4 p-steps up") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(lit("k").as("k"), col("l_orderkey").as("v")).distinct()
    val exact = li.count().toDouble
    def relErr(p: Int): Double = {
      val e = Sketches.hllEstimate(
        Sketches.hllRegisters(li, Seq("k"), "v", p = p), Seq("k"), p = p)
        .collect().head.getAs[Double]("est_distinct")
      math.abs(e - exact) / exact
    }
    val (loose, tight) = (relErr(6), relErr(10))
    // theoretical se: 1.04/sqrt(m) → 13% at p=6, 3.3% at p=10. One
    // draw is noisy, so assert generous envelopes, not the exact se.
    assert(tight <= 0.10, s"p=10 relative error $tight above 10%")
    assert(loose <= 0.50, s"p=6 relative error $loose above 50%")
  }

  test("CMS: split-merge equals one-shot; estimate >= exact over the whole vocab") {
    // any item stream works for the algebra — a plain whitespace split
    // here; the oracle query uses the shared corpus tokenizer
    val counts = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val full = Sketches.cmsCounters(counts, "token", "cnt")
    val coin = abs(hash(col("token"))) % 2
    val merged = Sketches.cmsMerge(
      Sketches.cmsCounters(counts.filter(coin === 0), "token", "cnt"),
      Sketches.cmsCounters(counts.filter(coin === 1), "token", "cnt"))
    assert(canon(merged) == canon(full), "sum-merge != one-shot counters")
    // one-sided guarantee: EVERY token estimates at or above its true
    // count (the oracle query only checks the top-20 probe set)
    val under = Sketches.cmsEstimate(full, counts, "token")
      .join(counts, "token")
      .filter(col("est_cnt") < col("cnt")).count()
    assert(under == 0, s"$under tokens under-estimated — breaks CMS guarantee")
    // counter table size is geometry-bounded regardless of vocab size
    assert(full.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
  }

  test("KMV: union-of-sketches == sketch-of-union; exact mode below k") {
    import spark.implicits._
    val vals = (1L to 5000L).toDF("v").withColumn("k", lit("all"))
    val halves = Seq(vals.filter(col("v") % 2 === 0),
      vals.filter(col("v") % 2 === 1))
    val full = Sketches.kmvSketch(vals, Seq("k"), "v")
    // bottom-k of the two halves' sketches == bottom-k of everything:
    // the k smallest overall hashes are each the k smallest of their
    // half, so no information is lost — the KMV merge guarantee
    val mergedHashes = halves.map(h =>
      Sketches.kmvSketch(h, Seq("k"), "v").select("kmv_h"))
      .reduce(_ union _).distinct()
      .orderBy(col("kmv_h")).limit(Sketches.KmvK)
    assert(canon(mergedHashes) == canon(full.select("kmv_h")),
      "sketch merge lost a bottom-k hash")
    // exact mode: fewer than k distinct values → the estimate IS the count
    val tiny = (1L to 40L).toDF("v").withColumn("k", lit("t"))
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(tiny, Seq("k"), "v"), Seq("k")).collect().head
    assert(est.getAs[Double]("est_distinct") == 40.0)
  }

  test("KMV exact mode: below-k sets intersect exactly; null values don't count") {
    import spark.implicits._
    // |A|=30, |B|=21, |A∩B|=11 — all below k, so sketches hold the
    // full hash sets and the intersection must come back EXACT
    val a = Sketches.kmvSketch(
      (1L to 30L).toDF("v").withColumn("k", lit("a")), Seq("k"), "v")
      .select("kmv_h")
    val b = Sketches.kmvSketch(
      (20L to 40L).toDF("v").withColumn("k", lit("b")), Seq("k"), "v")
      .select("kmv_h")
    val r = Sketches.kmvIntersect(a, b).collect().head
    assert(r.getAs[Long]("common_cnt") == 11L)
    assert(r.getAs[Double]("est_intersection") == 11.0,
      s"exact-mode intersection ${r.getAs[Double]("est_intersection")}")
    assert(r.getAs[Double]("est_union") == 40.0) // |{1..40}|
    // exact mode covers the whole algebra: per-side sizes and the
    // inclusion–exclusion difference come back exact too
    assert(r.getAs[Double]("est_a") == 30.0)
    assert(r.getAs[Double]("est_b") == 21.0)
    assert(r.getAs[Double]("est_a_minus_b") == 19.0) // |{1..19}|
    // null values are not distinct values — sketch unchanged by nulls
    val withNulls = (1L to 30L).toDF("v").withColumn("k", lit("a"))
      .union(Seq.fill(5)((null.asInstanceOf[java.lang.Long], "a"))
        .toDF("v", "k").select(col("v").cast("long"), col("k")))
    assert(canon(Sketches.kmvSketch(withNulls, Seq("k"), "v")) ==
      canon(Sketches.kmvSketch(
        (1L to 30L).toDF("v").withColumn("k", lit("a")), Seq("k"), "v")))
  }

  test("HLL ignores nulls; CMS estimates unseen probe items as zero") {
    import spark.implicits._
    val clean = (1L to 500L).toDF("v").withColumn("k", lit("x"))
    val dirty = clean.union(Seq.fill(7)((null.asInstanceOf[java.lang.Long], "x"))
      .toDF("v", "k").select(col("v").cast("long"), col("k")))
    assert(canon(Sketches.hllRegisters(dirty, Seq("k"), "v")) ==
      canon(Sketches.hllRegisters(clean, Seq("k"), "v")),
      "a NULL value minted a phantom register")
    // unseen probe item → every cell empty → estimate 0, not dropped
    val counters = Sketches.cmsCounters(
      Seq(("alpha", 5L), ("beta", 3L)).toDF("item", "cnt"), "item", "cnt")
    val est = Sketches.cmsEstimate(counters,
      Seq("alpha", "never_ingested_zzz").toDF("item"), "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 5L)
    assert(est.contains("never_ingested_zzz"),
      "unseen probe item dropped from the estimate")
    assert(est("never_ingested_zzz") == 0L)
  }

  test("KMV intersection: partial overlap estimated within the error envelope") {
    import spark.implicits._
    // |A|=2000 (1..2000), |B|=2000 (1301..3300), |A∩B|=700
    val a = Sketches.kmvSketch(
      (1L to 2000L).toDF("v").withColumn("k", lit("a")), Seq("k"), "v")
      .select("kmv_h")
    val b = Sketches.kmvSketch(
      (1301L to 3300L).toDF("v").withColumn("k", lit("b")), Seq("k"), "v")
      .select("kmv_h")
    val r = Sketches.kmvIntersect(a, b).collect().head
    val estI = r.getAs[Double]("est_intersection")
    val estU = r.getAs[Double]("est_union")
    // k=64 → RSE ~13%; generous 3σ envelopes on both estimates
    assert(math.abs(estU - 3300.0) < 0.4 * 3300.0, s"union est $estU")
    assert(math.abs(estI - 700.0) < 0.5 * 700.0, s"intersection est $estI")
    // and disjoint sets must estimate (near) zero
    val c = Sketches.kmvSketch(
      (9001L to 11000L).toDF("v").withColumn("k", lit("c")), Seq("k"), "v")
      .select("kmv_h")
    val rd = Sketches.kmvIntersect(a, c).collect().head
    assert(rd.getAs[Double]("est_intersection") < 0.1 * 2000.0,
      s"disjoint intersection ${rd.getAs[Double]("est_intersection")}")
  }

  test("histogram: split-merge equals one-shot; quantiles within one bucket width") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val full = Sketches.histBuckets(li, Seq("l_returnflag"), "l_extendedprice")
    val coin = abs(hash(col("l_orderkey"))) % 2
    val merged = Sketches.histMerge(Seq("l_returnflag"),
      Sketches.histBuckets(li.filter(coin === 0), Seq("l_returnflag"),
        "l_extendedprice"),
      Sketches.histBuckets(li.filter(coin === 1), Seq("l_returnflag"),
        "l_extendedprice"))
    assert(canon(merged) == canon(full), "sum-merge != one-shot histogram")
    // estimates vs exact: one bucket is ≤ 2^-3 relative width, so the
    // midpoint estimate sits within ~6.5% of any exact quantile
    val est = Sketches.histQuantiles(full, Seq("l_returnflag"))
      .join(li.groupBy("l_returnflag").agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("x50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("x90")),
        "l_returnflag").collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (e50, e90) = (r.getAs[Double]("est_p50"), r.getAs[Double]("est_p90"))
      val (x50, x90) = (r.getAs[Double]("x50"), r.getAs[Double]("x90"))
      assert(math.abs(e50 - x50) / x50 <= 0.07, s"p50 $e50 vs $x50")
      assert(math.abs(e90 - x90) / x90 <= 0.07, s"p90 $e90 vs $x90")
    }
  }

  test("gold histogram sidecar: cross-slice quantile rollup within bucket width") {
    val out = java.nio.file.Files.createTempDirectory("graft_goldhist")
      .toString + "/hist"
    graft.etl.GoldAggregates.materializeRateHistogram(spark, sf0001, out)
    val fact = graft.etl.GoldAggregates
      .ratesWithState(spark, sf0001, "negotiated_rate")
    // per-state p50/p90 across ALL months — not derivable from
    // per-slice percentiles, exactly the histogram's job
    val exact = fact.groupBy("state").agg(
      percentile(col("v"), lit(0.5)).as("x50"),
      percentile(col("v"), lit(0.9)).as("x90"))
    val rolled = graft.etl.GoldAggregates
      .quantileRollup(spark, out, Seq("state"))
      .join(exact, "state").collect()
    assert(rolled.nonEmpty)
    rolled.foreach { r =>
      assert(math.abs(r.getAs[Double]("est_p50") - r.getAs[Double]("x50")) /
        r.getAs[Double]("x50") <= 0.07, s"state ${r.getString(0)} p50")
      assert(math.abs(r.getAs[Double]("est_p90") - r.getAs[Double]("x90")) /
        r.getAs[Double]("x90") <= 0.07, s"state ${r.getString(0)} p90")
    }
  }

  test("gold distinct-sketch sidecar: cross-slice rollups without a fact rescan") {
    val out = java.nio.file.Files.createTempDirectory("graft_goldsketch")
      .toString + "/sketch"
    graft.etl.GoldAggregates.materializeDistinctSketch(spark, sf0001, out)
    val fact = graft.etl.GoldAggregates.ratesWithState(spark, sf0001)
      .withColumnRenamed("v", "provider_reference_id")
    // per-state rollup across ALL months — the question the gold
    // table's per-slice npi_count cannot answer
    val exact = fact.groupBy("state")
      .agg(countDistinct(col("provider_reference_id")).as("exact"))
    val rolled = graft.etl.GoldAggregates
      .distinctRollup(spark, out, Seq("state"))
      .join(exact, "state").collect()
    assert(rolled.nonEmpty)
    rolled.foreach { r =>
      val (e, x) = (r.getAs[Double]("est_distinct"), r.getAs[Long]("exact"))
      assert(math.abs(e - x) <= math.max(3.0, 0.2 * x),
        s"state ${r.getString(0)}: estimate $e vs exact $x")
    }
    // the naive alternative — summing per-slice distinct counts —
    // can only overcount (providers active in several months)
    val naive = fact.groupBy("state", "year_month")
      .agg(countDistinct(col("provider_reference_id")).as("c"))
      .groupBy("state").agg(sum(col("c")).as("naive"))
      .join(exact, "state").collect()
    naive.foreach { r =>
      assert(r.getAs[Long]("naive") >= r.getAs[Long]("exact"))
    }
    // filtered rollup prunes to the partitions under the predicate
    val oneState = rolled.head.getString(0)
    val single = graft.etl.GoldAggregates.distinctRollup(spark, out,
      Seq("state"), col("state") === oneState).collect()
    assert(single.length == 1 && single.head.getString(0) == oneState)
  }

  test("gold KMV sidecar: cross-slice intersection, exact for small slices") {
    val out = java.nio.file.Files.createTempDirectory("graft_goldkmv")
      .toString + "/kmv"
    graft.etl.GoldAggregates.materializeKmvSketch(spark, sf0001, out)
    val fact = graft.etl.GoldAggregates.ratesWithState(spark, sf0001)
    // two busiest slices of one state: months that share providers
    val top = fact.filter(col("state").isNotNull)
      .groupBy("state", "year_month").count()
      .orderBy(col("count").desc, col("state"), col("year_month"))
      .limit(2).collect()
    val Array(a, b) = top.map(r => (r.getString(0), r.getString(1)))
    def providerSet(s: (String, String)): Set[String] =
      fact.filter(col("state") <=> lit(s._1) &&
          col("year_month") <=> lit(s._2))
        .select("v").distinct().collect().map(_.getString(0)).toSet
    val (pa, pb) = (providerSet(a), providerSet(b))
    val r = graft.etl.GoldAggregates.sliceIntersection(spark, out, a, b)
      .collect().head
    if (pa.size < Sketches.KmvK && pb.size < Sketches.KmvK) {
      // exact mode: the sketches hold the full sets
      assert(r.getAs[Double]("est_a") == pa.size.toDouble)
      assert(r.getAs[Double]("est_b") == pb.size.toDouble)
      assert(r.getAs[Double]("est_intersection") == (pa & pb).size.toDouble,
        s"exact-mode slice intersection ${r.getAs[Double]("est_intersection")}" +
          s" vs ${(pa & pb).size}")
      assert(r.getAs[Double]("est_a_minus_b") == (pa -- pb).size.toDouble)
    } else {
      val exact = (pa & pb).size.toDouble
      assert(math.abs(r.getAs[Double]("est_intersection") - exact) <=
        math.max(5.0, 0.5 * exact))
    }
  }

  test("sidecar read cache: rewrite invalidates the resolved file list") {
    val out = java.nio.file.Files.createTempDirectory("graft_sidecache")
      .toString + "/sk"
    graft.etl.GoldAggregates.materializeDistinctSketch(spark, sf0001, out)
    // prime the resolved-frame cache with the first file generation
    val before = graft.etl.GoldAggregates
      .distinctRollup(spark, out, Seq("state")).collect()
    assert(before.nonEmpty)
    // full rewrite: dynamic overwrite mints new part-file names — a
    // stale cached frame would now reference deleted paths and throw
    graft.etl.GoldAggregates.materializeDistinctSketch(spark, sf0001, out)
    val after = graft.etl.GoldAggregates
      .distinctRollup(spark, out, Seq("state")).collect()
    assert(after.map(_.toSeq).toSet == before.map(_.toSeq).toSet,
      "post-rewrite rollup drifted (same base, same registers expected)")
  }

  test("sidecar rollups under a slice predicate prune at the partition level") {
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.etl.GoldAggregates.materializeDistinctSketch(spark, sf0001,
      s"$base/sketch")
    graft.etl.GoldAggregates.materializeRateHistogram(spark, sf0001,
      s"$base/hist")
    val st = spark.read.parquet(s"$base/sketch").select("state")
      .filter(col("state").isNotNull).head.getString(0)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        // AQE hides the real plan behind an adaptive root — recurse
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    def partitionFiltersNonEmpty(df: org.apache.spark.sql.DataFrame) = {
      val s = scans(df.queryExecution.executedPlan)
      s.nonEmpty && s.forall(_.partitionFilters.nonEmpty)
    }
    assert(partitionFiltersNonEmpty(graft.etl.GoldAggregates
        .distinctRollup(spark, s"$base/sketch", Seq("state"),
          col("state") === st)),
      "distinct rollup did not push the slice predicate to partitions")
    assert(partitionFiltersNonEmpty(graft.etl.GoldAggregates
        .quantileRollup(spark, s"$base/hist", Seq("state"),
          col("state") === st)),
      "quantile rollup did not push the slice predicate to partitions")
  }

  test("sketch queries: deterministic across runs and partitionings") {
    val q = SparkEntry.queries("sketch_hll_distinct")
    val a = canon(q(spark, sf0001))
    val b = canon(q(spark, sf0001).repartition(7))
    assert(a == b, "register math must not depend on partitioning")
  }
}
