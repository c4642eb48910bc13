package graft

import java.nio.file.Files
import graft.sources.BucketedTables

/** The co-location contract: once both sides are bucketed on the join
  * key, joins and aggregations on that key plan WITHOUT any
  * ShuffleExchange — the write-once shuffle is the whole point. */
class BucketedJoinSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
  }

  test("bucketed join + agg on the bucket key are exchange-free") {
    val path = Files.createTempDirectory("graft_buckets").toString
    BucketedTables.writeBucketed(spark, sf0001, "graft_b", path)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the test exercises the bucketed
      // SortMergeJoin path (at real scale neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.coLocatedJoin(spark, "graft_b")
      assert(joined.count() ==
        Tables.load(spark, sf0001, "lineitem").count())
      assert(shuffleCount(BucketedTables.coLocatedJoin(spark, "graft_b")) == 0,
        "bucketed join must not shuffle")
      assert(shuffleCount(BucketedTables.coLocatedAgg(spark, "graft_b")) == 0,
        "aggregation on the bucket key must not shuffle")
      // control: the same join over plain parquet DOES shuffle
      val l = Tables.load(spark, sf0001, "lineitem")
      val o = Tables.load(spark, sf0001, "orders")
      assert(shuffleCount(l.join(o,
        l("l_orderkey") === o("o_orderkey"))) > 0,
        "control: unbucketed join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_b.orders_b")
    }
  }
}
