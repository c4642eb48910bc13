package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** The layout operators' contracts: correctness (probe ≡ plain
  * filter / salted join ≡ plain join) AND the scale property the
  * operators exist for — file-grain skipping, pinned by counting the
  * files a probe actually hands to the reader. */
class LayoutSpec extends SparkSpec {

  private def li = Tables.load(spark, sf0001, "lineitem")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_layout_spec")
      .toString + "/zl"
    Layout.zorderWrite(spark, li, Seq("l_suppkey", "l_partkey"), d)
    Layout.writeBloomManifest(spark, d, "l_orderkey",
      estItems = 1000L, numBits = 1L << 16)
    d
  }

  private def totalFiles: Long =
    spark.read.parquet(dir).select(input_file_name())
      .distinct().count()

  /** Files the zone-map manifest admits for `box`. */
  private def admitted(box: Seq[(String, Long, Long)]): Long = {
    val mm = spark.read.parquet(s"$dir/_manifest_mm")
    box.foldLeft(mm) { case (m, (c, lo, hi)) =>
      m.filter(col(s"min_$c") <= hi && col(s"max_$c") >= lo)
    }.count()
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("z-value interleaves bits: bit b of col i lands at b*n+i") {
    val df = spark.range(1).select(
      Layout.zValue(Seq(lit(1L), lit(0L)), bits = 2).as("a"), // col0=0b01
      Layout.zValue(Seq(lit(0L), lit(1L)), bits = 2).as("b"), // col1=0b01
      Layout.zValue(Seq(lit(3L), lit(3L)), bits = 2).as("c"))
    val r = df.head()
    assert(r.getLong(0) == 1L) // col0 bit0 → z-bit 0
    assert(r.getLong(1) == 2L) // col1 bit0 → z-bit 1
    assert(r.getLong(2) == 15L) // all four low z-bits
  }

  test("zone-pruned box probe: exact result, most files skipped") {
    val box = Seq(("l_suppkey", 2L, 4L), ("l_partkey", 40L, 120L))
    val got = Layout.zonePrunedRead(spark, dir, box)
    val want = li.filter(col("l_suppkey").between(2, 4) &&
      col("l_partkey").between(40, 120))
    assert(got.count() > 0)
    assert(sortedRows(got).sameElements(sortedRows(want)))
    // the scale property: a ~30% x ~40% box must not admit the whole
    // file set — Morton clustering keeps both envelopes tight
    assert(admitted(box) < totalFiles,
      s"box admitted all $totalFiles files — no skipping")
  }

  test("secondary-column probe skips files a lexicographic sort cannot") {
    val box = Seq(("l_partkey", 40L, 80L))
    val got = Layout.zonePrunedRead(spark, dir, box)
    val want = li.filter(col("l_partkey").between(40, 80))
    assert(got.count() > 0)
    assert(sortedRows(got).sameElements(sortedRows(want)))
    // z-order: a 20%-selective predicate on the SECOND column admits
    // well under the full file set…
    assert(admitted(box) <= totalFiles / 2,
      s"partkey probe admitted ${admitted(box)} of $totalFiles files")
    // …whereas the same data sorted by l_suppkey alone leaves every
    // file's partkey envelope ~full-range: no file is skippable.
    val lex = java.nio.file.Files.createTempDirectory("graft_lex")
      .toString + "/lex"
    li.repartitionByRange(16, col("l_suppkey"))
      .sortWithinPartitions("l_suppkey")
      .write.mode("overwrite").parquet(lex)
    val lexAdmitted = spark.read.parquet(lex)
      .groupBy(input_file_name().as("file"))
      .agg(min("l_partkey").as("mn"), max("l_partkey").as("mx"))
      .filter(col("mn") <= 80 && col("mx") >= 40).count()
    val lexTotal = spark.read.parquet(lex)
      .select(input_file_name()).distinct().count()
    assert(lexAdmitted == lexTotal,
      "expected the suppkey-sorted layout to admit every file")
  }

  test("empty box prunes every file and returns an empty exact frame") {
    val got = Layout.zonePrunedRead(spark, dir,
      Seq(("l_suppkey", 5000L, 6000L)))
    assert(got.count() == 0)
    assert(got.columns.contains("l_partkey")) // schema preserved
  }

  test("bloom probe: no false negatives, absent keys read zero files") {
    val keys = Seq(1L, 7L, 42L)
    val got = Layout.bloomPrunedRead(spark, dir, "l_orderkey", keys)
    val want = li.filter(col("l_orderkey").isin(keys.map(k => k: Any): _*))
    assert(sortedRows(got).sameElements(sortedRows(want)))
    assert(got.count() == want.count() && got.count() > 0)
    // a key far outside the corpus: every bloom answers
    // definitely-absent, the probe reads nothing
    val absent = Layout.bloomPrunedRead(spark, dir, "l_orderkey",
      Seq(987654321L))
    assert(absent.count() == 0)
  }

  test("append: delta clusters under persisted boundaries, probes exact") {
    val d = java.nio.file.Files.createTempDirectory("graft_layout_app")
      .toString + "/zl"
    Layout.zorderWrite(spark, li.filter(col("l_orderkey") < 700),
      Seq("l_suppkey", "l_partkey"), d)
    Layout.appendZorder(spark, li.filter(col("l_orderkey") >= 700), d)
    val box = Seq(("l_suppkey", 2L, 4L), ("l_partkey", 40L, 120L))
    val got = Layout.zonePrunedRead(spark, d, box)
    val want = li.filter(col("l_suppkey").between(2, 4) &&
      col("l_partkey").between(40, 120))
    assert(sortedRows(got).sameElements(sortedRows(want)))
    // the delta bucketed under the BASE boundaries: its files still
    // carry tight envelopes, so the box must not admit everything
    val mm = spark.read.parquet(s"$d/_manifest_mm")
    val admitted = mm.filter(col("min_l_suppkey") <= 4 &&
      col("max_l_suppkey") >= 2 && col("min_l_partkey") <= 120 &&
      col("max_l_partkey") >= 40).count()
    assert(admitted < mm.count(),
      s"append probe admitted all ${mm.count()} files")
  }

  test("append crash-safety: unmanifested files invisible, sweep heals") {
    val d = java.nio.file.Files.createTempDirectory("graft_layout_crash")
      .toString + "/zl"
    val base = li.filter(col("l_orderkey") < 700)
    val delta = li.filter(col("l_orderkey") >= 700)
    Layout.zorderWrite(spark, base, Seq("l_suppkey", "l_partkey"), d)
    val box = Seq(("l_partkey", 40L, 80L))
    val preAppend = sortedRows(Layout.zonePrunedRead(spark, d, box))
    // simulate a crash between the data write and the manifest
    // publish: delta files land, manifest rows do not
    delta.write.mode("append").parquet(d)
    // probes serve exactly the committed (pre-append) layout — no
    // partial read, no phantom rows
    assert(sortedRows(Layout.zonePrunedRead(spark, d, box))
      .sameElements(preAppend))
    // the retry: appendZorder sweeps the orphans FIRST, so the
    // re-appended delta lands exactly once
    Layout.appendZorder(spark, delta, d)
    val got = Layout.zonePrunedRead(spark, d, box)
    val want = li.filter(col("l_partkey").between(40, 80))
    assert(got.count() == want.count(), "orphan sweep failed: row drift")
    assert(sortedRows(got).sameElements(sortedRows(want)))
  }

  test("salted join ≡ plain join, and the shuffle spreads the salt") {
    val big = Roles.rates(spark, sf0001)
      .withColumnRenamed("provider_reference_id", "provider_group_id")
      .select("l_orderkey", "l_linenumber", "provider_group_id",
        "negotiated_rate")
    val dim = Roles.providers(spark, sf0001)
      .select("provider_group_id", "provider_name", "state")
    val salted = graft.sources.SkewTools.saltedJoin(big, dim,
      "provider_group_id", nSalts = 4, joinType = "inner")
    val plain = big.join(dim, Seq("provider_group_id"))
    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")
    val a = salted.select(plain.columns.map(col): _*)
      .collect().map(key).sorted
    val b = plain.collect().map(key).sorted
    assert(a.sameElements(b))
    // the point of the op: the exchange partitions on (key, salt) —
    // a hot key can no longer pin one task
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"expected the salt in the physical plan:\n${plan.take(2000)}")
    // left join: unmatched big rows survive exactly once
    val dimHalf = dim.filter(col("provider_group_id").cast("long") < 5)
    val leftSalted = graft.sources.SkewTools.saltedJoin(big, dimHalf,
      "provider_group_id", nSalts = 4)
    val leftPlain = big.join(dimHalf, Seq("provider_group_id"), "left")
    assert(leftSalted.count() == leftPlain.count())
    assert(leftSalted.filter(col("provider_name").isNull).count() ==
      leftPlain.filter(col("provider_name").isNull).count())
  }
}
