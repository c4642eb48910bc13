package graft

import org.apache.spark.sql.functions._
import graft.queries.Inventory

/** t1-style smoke over sf0.001: fact build shape, uid grain, and the
  * driver's entry() contract. */
class StarSchemaSpec extends SparkSpec {

  test("star fact build: 14-col schema and deterministic uid grain") {
    val fact = Inventory.queries("star_fact_build")(spark, sf0001)
    assert(fact.columns.length == 14)
    assert(fact.columns.contains("fact_uid"))
    val n = fact.count()
    assert(n > 0)
    // fact_uid is md5 of the full grain → distinct uids == distinct rows
    assert(fact.select("fact_uid").distinct().count() == n)
  }

  test("fact build is deterministic across runs") {
    val a = Inventory.queries("star_fact_build")(spark, sf0001)
      .agg(count(lit(1)), countDistinct(col("fact_uid"))).head
    val b = Inventory.queries("star_fact_build")(spark, sf0001)
      .agg(count(lit(1)), countDistinct(col("fact_uid"))).head
    assert(a == b)
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry (driver contract)") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(q)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
