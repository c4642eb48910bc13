package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** End-to-end curation pipeline: the composed DuckDB oracle pins exact
  * values; these specs pin cross-stage properties that the per-stage
  * oracles cannot see. */
class PipelineSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("corpus_curate_e2e")(spark, sf0001).cache()

  test("exact duplicate copies never survive the pipeline") {
    // injected exact copies live at doc_id 100000-100009; dedup keeps
    // the base doc, so none of them may appear in the output
    assert(out.filter(col("doc_id").between(100000L, 100009L)).count() == 0)
  }

  test("no surviving document is benchmark-contaminated") {
    // re-flag the survivors against the same benchmark: all clean.
    // (guards the join direction — a bug keeping contaminated==1 rows
    // would still produce plausible-looking output)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    assert(!ids.exists(id => id % 17 == 3))
  }

  test("pipeline is deterministic across runs") {
    val a = SparkEntry.queries("corpus_curate_e2e")(spark, sf0001)
      .orderBy("doc_id").collect().toSeq
    val b = SparkEntry.queries("corpus_curate_e2e")(spark, sf0001)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("packed token stream is contiguous within each pack group") {
    val bad = out.groupBy(col("source"),
        (col("doc_id") / graft.operators.Packing.GroupDocs).cast("long"))
      .agg(max(col("token_start") + col("n_tokens")).as("end"),
        sum("n_tokens").as("total"))
      .filter(col("end") =!= col("total"))
    assert(bad.count() == 0)
  }

  test("scrub counted the injected footer PII on surviving footered docs") {
    // base docs only: augmented ids inherit the footer from their base
    // doc, so id % 7 does not indicate footer presence above 100000
    val base = out.filter(col("doc_id") < 100000)
    val footered = base.filter(col("doc_id") % 7 === 0)
    // every surviving footered doc had exactly one email/phone/ip
    assert(footered.count() > 0)
    assert(footered.filter(col("n_email") =!= 1 || col("n_phone") =!= 1 ||
      col("n_ip") =!= 1).count() == 0)
    // and non-footered survivors carry none
    assert(base.filter(col("doc_id") % 7 =!= 0)
      .filter(col("n_email") > 0).count() == 0)
  }
}
