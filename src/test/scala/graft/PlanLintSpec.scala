package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.PlanLint

/** The scale lint: each rule fires on its anti-pattern and stays
  * quiet on the legitimate bounded twin — then the meta-test holds
  * the ENTIRE declared query inventory to zero findings, so a future
  * query can't quietly ship a 100 TB scale killer. */
class PlanLintSpec extends SparkSpec {

  private def li = Tables.load(spark, sf0001, "lineitem")
  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  test("cartesian-join: fires on unbounded x unbounded, passes scalar crossJoin") {
    val bad = li.crossJoin(Tables.load(spark, sf0001, "orders"))
    assert(rules(bad).contains("cartesian-join"))
    // the broadcast-scalar pattern: one-row grand aggregate under a
    // condition-less join is the library's standard stats fold
    val stats = li.agg(avg("l_quantity").as("mean_qty"))
    assert(rules(li.crossJoin(stats)).isEmpty)
  }

  test("single-partition-window: fires unbounded, passes post-limit rerank") {
    val bad = li.withColumn("rn",
      row_number().over(Window.orderBy("l_orderkey")))
    assert(rules(bad).contains("single-partition-window"))
    val good = li.orderBy("l_orderkey").limit(25)
      .withColumn("rn", row_number().over(Window.orderBy("l_orderkey")))
    assert(rules(good).isEmpty)
    // and a keyed window is never a finding
    val keyed = li.withColumn("rn", row_number().over(
      Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(rules(keyed).isEmpty)
  }

  test("window-sort-expanded: fires on exploded streams, passes raw/agg") {
    val docs = Tables.load(spark, sf0001, "documents")
    // the span-removal anti-shape: keyed window sorting a
    // Generate-expanded stream (rows x fan-out)
    val exploded = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val bad = exploded.withColumn("rn", row_number().over(
      Window.partitionBy("doc_id").orderBy("tok")))
    assert(rules(bad).contains("window-sort-expanded"))
    // an aggregate between the Generate and the window collapses the
    // blow-up back to key grain — no finding
    val agged = exploded.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("n")))
    assert(rules(agged).isEmpty)
    // a keyed window over a RAW stream (sessionization class) is the
    // linear cost the operator signs up for — not this rule's target
    val raw = li.withColumn("rn", row_number().over(
      Window.partitionBy("l_orderkey").orderBy("l_linenumber")))
    assert(rules(raw).isEmpty)
  }

  test("global-sort-unbounded: fires mid-plan, passes top-k/local/root sort") {
    // a mid-plan total order: sorted frame feeding further computation
    val bad = li.orderBy("l_extendedprice")
      .withColumn("rn", row_number().over(
        Window.partitionBy("l_returnflag").orderBy("l_linenumber")))
    assert(rules(bad).contains("global-sort-unbounded"),
      bad.queryExecution.optimizedPlan.toString.take(1500))
    // top-k plans as TakeOrdered — no full sort ever runs
    assert(rules(li.orderBy("l_extendedprice").limit(100)).isEmpty)
    // task-local sort (the export writer's shape) is scale-safe
    assert(rules(li.sortWithinPartitions("l_extendedprice")).isEmpty)
    // ROOT presentation ordering: the cost is the result's size
    assert(rules(li.groupBy("l_returnflag").count()
      .orderBy("l_returnflag")).isEmpty)
  }

  test("meta: every declared query in the inventory is lint-clean") {
    // Bounded-by-construction exceptions the lint cannot see
    // statically, each with its reason ON RECORD; the test also fails
    // if a justification goes stale (the finding no longer fires).
    val justified: Map[String, Set[String]] = Map(
      // Both windows run at SCORE-GROUP grain: scores are published
      // 4-dp roundings, so the distinct-score frame is bounded by
      // construction (thousands of rows), just not provable via
      // maxRows — see Evaluation.scala's scale-shapes note.
      "classifier_eval_auc" -> Set("single-partition-window"),
      "classifier_calibration" -> Set("single-partition-window"))
    val perQuery = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        // lint is static — build the frame, never execute it. Queries
        // that materialize state on build (index/sidecar writes) still
        // run that build; sf0.001 keeps it cheap.
        name -> PlanLint.lint(fn(spark, sf0001))
    }
    val unexcused = perQuery.flatMap { case (name, fs) =>
      fs.filterNot(f => justified.getOrElse(name, Set.empty)(f.rule))
        .map(f => s"$name: $f")
    }
    assert(unexcused.isEmpty,
      s"scale findings in the declared inventory:\n${unexcused.mkString("\n")}")
    val byName = perQuery.toMap
    justified.foreach { case (name, rls) =>
      val fired = byName.getOrElse(name, Seq.empty).map(_.rule).toSet
      assert(rls.subsetOf(fired),
        s"stale justification for $name: ${rls -- fired} no longer fires")
    }
  }
}
