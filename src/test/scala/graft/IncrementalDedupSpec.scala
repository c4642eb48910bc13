package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental LSH against a signature store: the delta-batch path
  * must produce exactly the pairs a full re-run would produce for the
  * delta, and the store must be maintainable with the idempotent
  * anti-join append. */
class IncrementalDedupSpec extends SparkSpec {

  private def base = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "text")

  /** Ingest delta: the same injected-copy construction the fixture
    * queries use (exact copies of 0-9, near-copies of 10-19). */
  private def delta = base.filter(col("doc_id") < 20).select(
    (col("doc_id") + 100000).as("doc_id"),
    when(col("doc_id") < 10, col("text"))
      .otherwise(concat(col("text"), lit(" extra suffix tokens"))).as("text"))

  test("delta candidates == full-corpus candidates restricted to the delta") {
    val storeSig = Dedup.minhashSignaturesFor(base, "doc_id", "text")
    val newSig = Dedup.minhashSignaturesFor(delta, "doc_id", "text")
    val full = Dedup.lshCandidatePairs(storeSig.unionByName(newSig))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val newIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = full.filter(p => newIds(p._1) || newIds(p._2))
    val incr = Dedup.lshCandidatePairsIncremental(storeSig, newSig)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty) // the injected dups guarantee candidates
    assert(incr == expected)
    // and no old-old pair leaked through
    assert(!incr.exists(p => !newIds(p._1) && !newIds(p._2)))
  }

  test("signature store: append-unique is idempotent, delta composes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigstore")
      .toString + "/sig"
    val storeSig = Dedup.minhashSignaturesFor(base, "doc_id", "text")
    graft.etl.StarSchemaBuilder.appendUnique(spark, storeSig, dir, Seq("doc_id"))
    graft.etl.StarSchemaBuilder.appendUnique(spark, storeSig, dir, Seq("doc_id"))
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == storeSig.count()) // second append added nothing
    val newSig = Dedup.minhashSignaturesFor(delta, "doc_id", "text")
    graft.etl.StarSchemaBuilder.appendUnique(spark, newSig, dir, Seq("doc_id"))
    assert(spark.read.parquet(dir).count() == n1 + newSig.count())
    // incremental candidates off the FILE store match the in-memory run
    val fromStore = Dedup.lshCandidatePairsIncremental(
      spark.read.parquet(dir).join(newSig.select("doc_id"),
        Seq("doc_id"), "left_anti"),
      newSig).count()
    val inMem = Dedup.lshCandidatePairsIncremental(storeSig, newSig).count()
    assert(fromStore == inMem)
  }
}
