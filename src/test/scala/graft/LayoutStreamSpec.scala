package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.streaming.LayoutStream

/** Streaming z-order maintenance: probes over a stream-grown layout
  * equal the plain filter over the union corpus, replays land exactly
  * once, the stream's generation band never collides with pre-stream
  * appends, and every batch stays file-skippable. */
class LayoutStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_layoutstream")
    d.toFile.deleteOnExit(); d.toString
  }

  private lazy val li = Tables.load(spark, sf0001, "lineitem")
  private def slice(i: Int) = li.filter(col("l_orderkey") % 3 === i)
  private val box = Seq(("l_partkey", 40L, 80L))

  private def probe(dir: String) =
    Layout.zonePrunedRead(spark, dir, box)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("stream-grown layout ≡ plain filter over the union corpus") {
    val w = work()
    Layout.zorderWrite(spark, slice(0), Seq("l_suppkey", "l_partkey"),
      s"$w/zl")
    // a pre-stream batch append, so the stream base must start at 2
    Layout.appendZorder(spark, slice(1), s"$w/zl")
    LayoutStream.processBatch(slice(2), 0L, s"$w/zl")
    val want = li.filter(col("l_partkey").between(40, 80))
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(probe(s"$w/zl") == want)
    // generation band: build=0, append=1, stream batch 0 → 2
    assert(Layout.committedGens(spark, s"$w/zl") == Seq(0L, 1L, 2L))
  }

  test("replayed batch lands exactly once; empty batch is a no-op") {
    val w = work()
    Layout.zorderWrite(spark, slice(0), Seq("l_suppkey", "l_partkey"),
      s"$w/zl")
    LayoutStream.processBatch(slice(1), 0L, s"$w/zl")
    val before = probe(s"$w/zl")
    val rowsBefore = Layout.zonePrunedRead(spark, s"$w/zl",
      Seq(("l_partkey", 0L, Long.MaxValue))).count()
    LayoutStream.processBatch(slice(1), 0L, s"$w/zl") // replay
    assert(probe(s"$w/zl") == before)
    assert(Layout.zonePrunedRead(spark, s"$w/zl",
      Seq(("l_partkey", 0L, Long.MaxValue))).count() == rowsBefore,
      "replay doubled rows")
    LayoutStream.processBatch(li.filter(col("l_orderkey") < 0), 1L,
      s"$w/zl")
    assert(probe(s"$w/zl") == before)
  }

  test("compaction folds every generation to a fresh gen 0, probes unchanged") {
    val w = work()
    Layout.zorderWrite(spark, slice(0), Seq("l_suppkey", "l_partkey"),
      s"$w/zl")
    LayoutStream.processBatch(slice(1), 0L, s"$w/zl")
    LayoutStream.processBatch(slice(2), 1L, s"$w/zl")
    val before = probe(s"$w/zl")
    val total = Layout.zonePrunedRead(spark, s"$w/zl",
      Seq(("l_partkey", 0L, Long.MaxValue))).count()
    val folded = Layout.compactLayout(spark, s"$w/zl", nFiles = 8)
    assert(folded == total, "compaction changed the row count")
    assert(Layout.committedGens(spark, s"$w/zl") == Seq(0L))
    assert(probe(s"$w/zl") == before)
    // the rebuild re-clusters: the 20% partkey probe still skips
    val mm = spark.read.parquet(s"$w/zl/_manifest_mm")
    val admitted = mm.filter(col("min_l_partkey") <= 80 &&
      col("max_l_partkey") >= 40).count()
    assert(admitted < mm.count())
    // crash residue heals: a stale .compacting dir is swept, layout
    // intact
    val tmp = s"$w/zl" + graft.streaming.DedupStream.CompactTmpSuffix
    new java.io.File(tmp).mkdirs()
    Layout.compactLayout(spark, s"$w/zl", nFiles = 8)
    assert(!new java.io.File(tmp).exists())
    assert(probe(s"$w/zl") == before)
  }

  test("fold guard: replayed pre-fold batch fails loudly, new batches proceed") {
    val w = work()
    Layout.zorderWrite(spark, slice(0), Seq("l_suppkey", "l_partkey"),
      s"$w/zl")
    LayoutStream.processBatch(slice(1), 0L, s"$w/zl") // gen 1
    LayoutStream.processBatch(slice(2), 1L, s"$w/zl") // gen 2
    val before = probe(s"$w/zl")
    val total = Layout.zonePrunedRead(spark, s"$w/zl",
      Seq(("l_partkey", 0L, Long.MaxValue))).count()
    Layout.compactLayout(spark, s"$w/zl", nFiles = 8) // folds through 2
    // _stream_base survives the fold's dir swap (r11 ADVICE): the
    // layout stays stream-managed, manual appends still refuse
    assert(FsUtils.readString(spark, s"$w/zl/_stream_base")
      .map(_.trim) == Some("1"))
    intercept[IllegalArgumentException] {
      Layout.appendZorder(spark, slice(1), s"$w/zl")
    }
    // a replay of batch 1 (gen 2 ≤ foldHigh 2): its rows are already
    // in the folded base — loud failure, zero duplicates
    val ex = intercept[IllegalStateException] {
      LayoutStream.processBatch(slice(2), 1L, s"$w/zl")
    }
    assert(ex.getMessage.contains("folded"))
    assert(probe(s"$w/zl") == before)
    assert(Layout.zonePrunedRead(spark, s"$w/zl",
      Seq(("l_partkey", 0L, Long.MaxValue))).count() == total,
      "replay-after-fold duplicated rows")
    // a genuinely NEW batch (same checkpoint, next id) maps above the
    // fold and proceeds — the stream continues without a rebase
    LayoutStream.processBatch(li.filter(col("l_orderkey") % 7 === 3)
      .limit(0), 2L, s"$w/zl")
    assert(probe(s"$w/zl") == before)
  }

  test("hive-routed stream: creation + append per leaf, replay exactly-once") {
    val w = work(); val root = s"$w/fact"
    val pcols = Seq("l_returnflag")
    val zcols = Seq("l_suppkey", "l_partkey")
    // batch 0 CREATES the leaves (no pre-built tree at all)
    LayoutStream.processBatchHive(slice(0), 0L, root, pcols, zcols)
    LayoutStream.processBatchHive(slice(1), 1L, root, pcols, zcols)
    def probeAll() = Layout.zonePrunedReadLeaves(spark, root,
        Seq(("l_partkey", 0L, Long.MaxValue)), _ => true)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        "l_returnflag")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val want = li.filter(col("l_orderkey") % 3 < 2)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        "l_returnflag")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(probeAll() == want)
    // replay of the APPEND batch and of the CREATING batch: both land
    // exactly once (append replays uncommit their own generation;
    // creation replays route through the same per-leaf protocol)
    LayoutStream.processBatchHive(slice(1), 1L, root, pcols, zcols)
    assert(probeAll() == want)
    LayoutStream.processBatchHive(slice(0), 0L, root, pcols, zcols)
    assert(probeAll() == want)
    // a NEW partition value mid-stream creates its leaf
    val zRows = slice(2).withColumn("l_returnflag", lit("Z"))
    LayoutStream.processBatchHive(zRows, 2L, root, pcols, zcols)
    val gotZ = Layout.zonePrunedRead(spark, s"$root/l_returnflag=Z",
        Seq(("l_partkey", 0L, Long.MaxValue)))
    assert(gotZ.count() == slice(2).count())
    // leaves are stream-managed: manual appends refuse
    intercept[IllegalArgumentException] {
      Layout.appendZorder(spark,
        slice(0).drop("l_returnflag"), s"$root/l_returnflag=Z")
    }
    // each leaf carries its own boundaries + manifest (file-grain
    // skipping inside every leaf, streamed or created)
    val mm = spark.read.parquet(s"$root/l_returnflag=R/_manifest_mm")
    assert(mm.count() > 0)
  }

  test("null partition keys route to the hive default leaf, nothing lost") {
    val w = work(); val root = s"$w/fact"
    // every third row's partition key is null, plus one value carrying
    // hive-special characters (it must escape in the dir name and
    // round-trip on read)
    val batch = slice(0).withColumn("l_returnflag",
      when(col("l_orderkey") % 3 === 0, lit(null))
        .otherwise(concat(col("l_returnflag"), lit("/x"))))
    LayoutStream.processBatchHive(batch, 0L, root,
      Seq("l_returnflag"), Seq("l_suppkey", "l_partkey"))
    val got = Layout.zonePrunedReadLeaves(spark, root,
      Seq(("l_partkey", 0L, Long.MaxValue)), _ => true)
    // nothing dropped: === routing made the null-key predicate null
    // for every row (r12 ADVICE) — <=> keeps them
    assert(got.count() == batch.count(), "null-key rows were dropped")
    assert(got.filter(col("l_returnflag").isNull).count() ==
      batch.filter(col("l_returnflag").isNull).count())
    // the special characters escaped into the leaf name and came back
    val vals = got.select("l_returnflag").distinct().collect()
      .map(_.getString(0)).filter(_ != null).toSet
    assert(vals.forall(_.endsWith("/x")), vals.toString)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/l_returnflag=__HIVE_DEFAULT_PARTITION__")))
    // and a replay of the batch still lands exactly once per leaf
    LayoutStream.processBatchHive(batch, 0L, root,
      Seq("l_returnflag"), Seq("l_suppkey", "l_partkey"))
    assert(Layout.zonePrunedReadLeaves(spark, root,
      Seq(("l_partkey", 0L, Long.MaxValue)), _ => true).count() ==
      batch.count())
  }

  test("streamed generations keep tight envelopes (still skippable)") {
    val w = work()
    Layout.zorderWrite(spark, slice(0), Seq("l_suppkey", "l_partkey"),
      s"$w/zl")
    LayoutStream.processBatch(slice(1), 0L, s"$w/zl")
    LayoutStream.processBatch(slice(2), 1L, s"$w/zl")
    val mm = spark.read.parquet(s"$w/zl/_manifest_mm")
    val admitted = mm.filter(col("min_l_partkey") <= 80 &&
      col("max_l_partkey") >= 40).count()
    assert(admitted < mm.count(),
      s"20%-selective probe admitted all ${mm.count()} files")
  }
}
