package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed (pre-shuffled) table layout for co-located joins — the
  * standing 100 TB answer to "the fact joins orders on every query":
  * pay the shuffle ONCE at write time, then every join/aggregation on
  * the bucket key runs exchange-free.
  *
  * `spark.write.bucketBy(n, key).sortBy(key)` hashes rows into n
  * buckets per partition and records the layout in the catalog; the
  * planner then satisfies `ClusteredDistribution(key)` directly from
  * the scan, so SortMergeJoin needs no ShuffleExchange on either side
  * (BucketedJoinSpec asserts the plan). The same layout serves
  * repeated groupBy(key) aggregations.
  *
  * Sizing guidance at scale: buckets ≈ total_size / target_partition
  * (e.g. 100 TB fact / 256 MB → ~400k buckets is too many files per
  * write — use buckets ≈ cluster cores × small factor and let each
  * bucket hold multiple row groups; both join sides MUST use the same
  * bucket count and key or the planner falls back to a shuffle.)
  */
object BucketedTables {

  /** Write lineitem + orders bucketed by the join key as external
    * tables under `path`. One shuffle each, once. */
  def writeBucketed(spark: SparkSession, dir: String, db: String,
                    path: String, buckets: Int = 8): Unit = {
    // explicit LOCATION so nothing lands in the default ./spark-warehouse
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$path/_db'")
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$path/lineitem_b")
      .saveAsTable(s"$db.lineitem_b")
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$path/orders_b")
      .saveAsTable(s"$db.orders_b")
  }

  /** Fact ⋈ orders on the bucket key: with both sides bucketed
    * identically this plans as a zero-exchange SortMergeJoin. */
  def coLocatedJoin(spark: SparkSession, db: String): DataFrame = {
    val l = spark.table(s"$db.lineitem_b")
    val o = spark.table(s"$db.orders_b")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(l("l_orderkey"), l("l_linenumber"), l("l_extendedprice"),
        o("o_orderdate"), o("o_totalprice"))
  }

  /** groupBy on the bucket key: aggregation with no exchange either. */
  def coLocatedAgg(spark: SparkSession, db: String): DataFrame =
    spark.table(s"$db.lineitem_b")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_extendedprice").as("total"))
}
