package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrder

/** Z-order layout: measure the per-file min/max envelopes that parquet
  * stats-based skipping prunes on. The property that matters: a
  * z-ordered layout has NARROW envelopes in BOTH dimensions, while a
  * single-column sort leaves the second dimension full-width. */
class ZOrderSpec extends SparkSpec {

  /** Mean normalized per-file (max-min) envelope of `c` when `df` is
    * laid out into `n` files by `layout`. */
  private def envelope(layout: org.apache.spark.sql.DataFrame,
                       c: String): Double = {
    val spans = layout
      .select(col(c).cast("double").as("v"),
        spark_partition_id().as("pid"))
      .groupBy("pid").agg((max("v") - min("v")).as("span"))
      .agg(avg("span")).collect()(0).getDouble(0)
    val total = layout.agg(
      (max(col(c).cast("double")) - min(col(c).cast("double"))))
      .collect()(0).getDouble(0)
    spans / total
  }

  test("z-order clusters both dimensions; a plain sort only one") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val files = 16
    val zed = ZOrder.cluster(li, "l_partkey", "l_suppkey", files)
    val sorted = li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
    // plain sort: first dim tight, second dim ~full width per file
    assert(envelope(sorted, "l_partkey") < 0.2)
    assert(envelope(sorted, "l_suppkey") > 0.8)
    // z-order: BOTH dims well under full width — each file covers a
    // square of the key space, so min/max skipping works either way
    val za = envelope(zed, "l_partkey")
    val zb = envelope(zed, "l_suppkey")
    assert(za < 0.5, s"partkey envelope $za")
    assert(zb < 0.5, s"suppkey envelope $zb")
  }

  test("zkeyN at k=2 is bit-identical to the specialized 2-D key") {
    import spark.implicits._
    val vals = Seq((3.0, 97.5), (0.0, 0.0), (100.0, 100.0), (42.0, 7.0),
      (-1.0, 101.0), (55.5, 55.5))
    val df = vals.toDF("a", "b").select(
      ZOrder.zkey(col("a"), 0, 100, col("b"), 0, 100).as("fast"),
      ZOrder.zkeyN(Seq((col("a"), 0, 100), (col("b"), 0, 100))).as("gen"))
    assert(df.filter(col("fast") =!= col("gen")).count() == 0)
  }

  test("3-column clustering bounds every dimension's envelope") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_orderkey")
    val zed = ZOrder.clusterN(li,
      Seq("l_partkey", "l_suppkey", "l_orderkey"), 27)
    Seq("l_partkey", "l_suppkey", "l_orderkey").foreach { c =>
      val e = envelope(zed, c)
      assert(e < 0.7, s"$c envelope $e")
    }
  }

  test("zkeyN matches an independent bit-interleave reference (k=3)") {
    import spark.implicits._
    val vals = Seq((0.0, 0.0, 0.0), (100.0, 100.0, 100.0), (13.0, 77.0, 42.0),
      (99.9, 0.1, 50.0), (-3.0, 103.0, 0.0))
    val got = vals.toDF("a", "b", "c")
      .select(ZOrder.zkeyN(Seq((col("a"), 0, 100), (col("b"), 0, 100),
        (col("c"), 0, 100))).as("z"))
      .collect().map(_.getLong(0))
    val bits = 63 / 3 min 16 // = 16
    def rank(v: Double): Long = {
      val cell = ((v - 0) / 100.0 * ((1L << bits) - 1)).toLong
      math.min(math.max(cell, 0L), (1L << bits) - 1)
    }
    def ref(a: Double, b: Double, c: Double): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc |
          (((rank(a) >> i) & 1L) << (i * 3)) |
          (((rank(b) >> i) & 1L) << (i * 3 + 1)) |
          (((rank(c) >> i) & 1L) << (i * 3 + 2))
      }
    vals.zip(got).foreach { case ((a, b, c), z) =>
      assert(z == ref(a, b, c), s"($a,$b,$c): got $z, ref ${ref(a, b, c)}")
    }
  }

  test("zkey is a total deterministic function of its inputs") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0),
      (-5.0, 105.0)) // out-of-bounds clamps, no nulls produced
      .toDF("a", "b")
      .select(ZOrder.zkey(col("a"), 0, 100, col("b"), 0, 100).as("z"))
    val zs = df.collect().map(_.getLong(0))
    // corners of the 16-bit grid: (0,0)→0; (max,0)→evens all set;
    // (0,max)→odds all set; (max,max)→all 32 bits set
    assert(zs(0) == 0L)
    assert(zs(1) == 0x55555555L)
    assert(zs(2) == 0xAAAAAAAAL)
    assert(zs(3) == 0xFFFFFFFFL)
    assert(zs(4) == 0xAAAAAAAAL) // clamped to (0, max)
  }

  test("z-ordered parquet files carry narrow stats for both columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder")
      .toString + "/t"
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    ZOrder.write(li, "l_partkey", "l_suppkey", 16, dir)
    val byFile = spark.read.parquet(dir)
      .select(col("l_partkey").cast("double").as("a"),
        input_file_name().as("f"))
      .groupBy("f").agg((max("a") - min("a")).as("span"))
    assert(byFile.count() >= 4) // several files, not one blob
    val total = li.agg((max("l_partkey") - min("l_partkey")).cast("double"))
      .collect()(0).getDouble(0)
    val mean = byFile.agg(avg("span")).collect()(0).getDouble(0)
    assert(mean / total < 0.5)
  }
}
