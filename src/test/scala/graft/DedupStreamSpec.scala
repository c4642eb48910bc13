package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.DedupStream

/** Streaming incremental dedup: batch-by-batch processing must land on
  * the same candidate-pair set as one full-corpus run, survive batch
  * replay unchanged (the foreachBatch at-least-once contract), and
  * absorb re-deliveries. */
class DedupStreamSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "text")

  test("micro-batched pairs == full-corpus pairs; replay is a no-op") {
    val work = Files.createTempDirectory("graft_dstream").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    // batch 0: the base corpus; batch 1: injected copies of 0-19 plus a
    // RE-DELIVERY of docs 0-4 (at-least-once ingest)
    val b0 = docs
    val copies = docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") < 10, col("text"))
        .otherwise(concat(col("text"), lit(" extra suffix tokens")))
        .as("text"))
    val b1 = copies.unionByName(docs.filter(col("doc_id") < 5))

    DedupStream.processBatch(b0, 0L, "doc_id", "text", store, pairs)
    DedupStream.processBatch(b1, 1L, "doc_id", "text", store, pairs)

    def pairSet = spark.read.parquet(pairs)
      .select("doc_a", "doc_b", "n_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = pairSet

    // one-shot reference: all docs at once
    val full = Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesFor(b0.unionByName(copies), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == full,
      s"streamed ${streamed.size} pairs vs full ${full.size}")
    assert(streamed.nonEmpty)

    // store holds every doc exactly once despite the re-delivery
    val storeIds = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0))
    assert(storeIds.length == storeIds.distinct.length)
    assert(storeIds.length == b0.count() + copies.count())

    // replay batch 1 (checkpoint commit lost): identical end state
    DedupStream.processBatch(b1, 1L, "doc_id", "text", store, pairs)
    assert(pairSet == streamed)
    assert(spark.read.parquet(store).count() == storeIds.length)
  }

  test("autocompaction keeps N micro-appends under the file bound") {
    val work = Files.createTempDirectory("graft_dcompact").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    def storeFiles = new java.io.File(store).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    val maxFiles = 8
    // 10 disjoint 40-doc batches; each append adds a file per shuffle
    // partition, so without compaction the store blows past the bound
    (0 until 10).foreach { b =>
      val batch = docs.filter(col("doc_id") % 10 === b).limit(40)
      DedupStream.processBatch(batch, b.toLong, "doc_id", "text",
        store, pairs, maxStoreFiles = maxFiles)
    }
    // bound honored: after any batch that tripped the compactor the
    // store is rewritten to ~one file, so growth restarts from there —
    // the count can never exceed bound + one batch's worth of appends
    assert(storeFiles <= maxFiles + spark.conf
      .get("spark.sql.shuffle.partitions").toInt,
      s"store holds $storeFiles files, bound was $maxFiles")
    // and at least one compaction actually ran (growth was reset);
    // content is intact: one signature row per distinct ingested doc
    val ids = spark.read.parquet(store).select("doc_id").collect()
      .map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    assert(storeFiles < 10 * 2, "no compaction ever ran")
    // a crash mid-swap is healed on the next batch: simulate the gap
    // (store renamed away, committed fresh copy left beside it)
    val fs = new java.io.File(store)
    val tmp = new java.io.File(store + ".compacting")
    assert(fs.renameTo(tmp))
    DedupStream.recoverCompaction(spark, store)
    assert(fs.exists && !tmp.exists)
    assert(spark.read.parquet(store).select("doc_id").count() == ids.length)
  }

  test("a store dir holding only crash residue counts as empty") {
    // a driver killed inside the FIRST store append leaves the path
    // existing with only _temporary/_SUCCESS-style entries; the replay
    // must take the empty-store branch, not die reading no footers
    val work = Files.createTempDirectory("graft_dcrash").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    new java.io.File(s"$store/_temporary/0").mkdirs()
    DedupStream.processBatch(docs.limit(30), 0L, "doc_id", "text",
      store, pairs)
    // batch processed as the first: signatures landed, store readable
    assert(spark.read.parquet(store).count() == 30)
    assert(spark.read.parquet(store).columns.contains("ingest_batch"))
  }
}
