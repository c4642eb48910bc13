package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.streaming.SampleStream

/** Streaming weighted reservoir: after any prefix of batches the store
  * equals the batch priority-sampler over the union corpus, replays
  * and reorderings are no-ops, and state never exceeds k rows. */
class SampleStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_samplestream")
    d.toFile.deleteOnExit(); s"${d.toString}/store"
  }

  private lazy val docs = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "source", "n_chars")
  private def slice(i: Int) = docs.filter(col("doc_id") % 3 === i)

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("stream-folded reservoir ≡ batch sampler over the union corpus") {
    val store = work()
    (0 to 2).foreach(i =>
      SampleStream.processBatch(slice(i), store, "n_chars", "doc_id", 25))
    val want = Curation.samplePriorityWeighted(docs, col("n_chars"),
      col("doc_id"), 25)
    assert(keys(SampleStream.snapshot(spark, store)) == keys(want))
    assert(SampleStream.snapshot(spark, store).count() == 25)
  }

  test("replay and empty batches are no-ops; state stays k rows") {
    val store = work()
    SampleStream.processBatch(slice(0), store, "n_chars", "doc_id", 25)
    SampleStream.processBatch(slice(1), store, "n_chars", "doc_id", 25)
    val before = SampleStream.snapshot(spark, store)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    SampleStream.processBatch(slice(1), store, "n_chars", "doc_id", 25)
    SampleStream.processBatch(docs.filter(col("doc_id") < 0), store,
      "n_chars", "doc_id", 25)
    val after = SampleStream.snapshot(spark, store)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(after == before)
  }

  test("order-independence: permuted batches land on the same reservoir") {
    val a = work(); val b = work()
    Seq(0, 1, 2).foreach(i =>
      SampleStream.processBatch(slice(i), a, "n_chars", "doc_id", 25))
    Seq(2, 0, 1).foreach(i =>
      SampleStream.processBatch(slice(i), b, "n_chars", "doc_id", 25))
    val ka = SampleStream.snapshot(spark, a)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val kb = SampleStream.snapshot(spark, b)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(ka == kb)
  }

  test("pre-first-commit snapshot is empty, not PATH_NOT_FOUND") {
    assert(SampleStream.snapshot(spark, work()).count() == 0)
  }

  test("pre-commit snapshot is TYPED once a batch ran (r11 ADVICE)") {
    val store = work()
    SampleStream.processBatch(slice(0), store, "n_chars", "doc_id", 25)
    // simulate the crash window: schema sidecar written, store commit
    // lost — callers selecting reservoir columns must still succeed
    val p = new org.apache.hadoop.fs.Path(store)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val snap = SampleStream.snapshot(spark, store)
    assert(snap.count() == 0)
    assert(snap.columns.contains("doc_id") &&
      snap.columns.contains("priority"))
    assert(snap.select("doc_id", "n_chars").count() == 0) // no AnalysisException
  }
}
