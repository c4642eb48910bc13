package graft

import org.apache.spark.sql.functions._

/** Evaluation operators: the oracles pin exact values; these specs pin
  * the metric semantics (range, conservation, monotonicity). */
class EvaluationSpec extends SparkSpec {

  test("auc is a proper probability and accounts for every doc") {
    val r = SparkEntry.queries("classifier_eval_auc")(spark, sf0001).head()
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nPos > 0 && nNeg > 0)
    assert(nPos + nNeg ==
      Tables.load(spark, sf0001, "documents").count())
    assert(auc >= 0.0 && auc <= 1.0, s"auc out of range: $auc")
  }

  test("calibration deciles partition the corpus and scores fall with decile") {
    val rows = SparkEntry.queries("classifier_calibration")(spark, sf0001)
      .orderBy("decile").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    assert(rows.map(_.getLong(1)).sum ==
      Tables.load(spark, sf0001, "documents").count())
    val means = rows.map(_.getDouble(4))
    assert(means.sliding(2).forall { case Array(a, b) => b <= a },
      s"mean score not nonincreasing across deciles: ${means.mkString(", ")}")
  }

  test("js divergence is nonnegative, bounded by ln 2, and zero for identical sides") {
    val r = SparkEntry.queries("corpus_drift_js")(spark, sf0001).head()
    val js = r.getDouble(3)
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"js out of range: $js")
    // two parity halves of one synthetic corpus: similar but not equal
    assert(js < 0.1, s"parity halves should be near-identical, js=$js")
  }
}
