package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ranking
import graft.plans.PlanLint

/** Distributed global rank: the bucketed two-pass must equal the
  * single-window row_number spec exactly, stay lint-clean (no
  * single-partition window — that's the shape it exists to replace),
  * and survive the degenerate distributions (all-ties, tiny inputs)
  * where boundary bucketing could slip. */
class RankingSpec extends SparkSpec {

  test("bucketed rank equals the single-window spec, and is lint-clean") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_extendedprice").as("k"),
        concat_ws("|", col("l_orderkey"), col("l_linenumber")).as("id"))
    val got = Ranking.globalRank(li, "k", "id", nBuckets = 8)
    assert(PlanLint.lint(got).isEmpty,
      "the rank op must not itself trip the scale lint")
    val want = li.withColumn("rank",
      row_number().over(Window.orderBy("k", "id")).cast("long"))
    assert(got.select("id", "rank").collect().map(_.toSeq).toSet ==
      want.select("id", "rank").collect().map(_.toSeq).toSet,
      "bucketed rank diverged from the window spec")
    // spread check: work actually distributes across buckets
    val nb = got.select(countDistinct(
      floor((col("rank") - 1) * 8 / li.count()))).head.getLong(0)
    assert(nb > 1, "everything landed in one bucket on spread data")
  }

  test("degenerate distributions: all-equal keys, single row, empty") {
    import spark.implicits._
    val ties = (1L to 100L).map(i => (42L, i)).toDF("k", "id")
    val got = Ranking.globalRank(ties, "k", "id", nBuckets = 4)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.sortBy(_._1).map(_._2).toSeq == (1L to 100L),
      "ties must rank by id, adjacent and complete")
    val one = Ranking.globalRank(Seq((1L, 1L)).toDF("k", "id"), "k", "id")
    assert(one.select("rank").head.getLong(0) == 1L)
    val empty = Ranking.globalRank(
      spark.emptyDataset[(Long, Long)].toDF("k", "id"), "k", "id")
    assert(empty.count() == 0)
  }
}
