package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Streaming incremental content-dedup: each micro-batch of documents
  * is the ingest delta of [[Dedup.lshCandidatePairsIncremental]] —
  * signatures are computed for the batch only, candidate pairs against
  * the persisted signature store are emitted, and the batch's
  * signatures join the store. The corpus is re-minhashed never.
  *
  * Per-batch cost, honestly: O(batch) signature work (the expensive
  * md5-per-shingle part), PLUS an O(|store|) banding pass — the
  * incremental path re-derives the store's band rows and re-aggregates
  * bucket counts over store ∪ delta every batch, because the exact
  * hot-bucket cap must see post-merge totals. At 100 TB that term
  * dominates small deltas: banding is 4 md5s per stored signature and
  * the bucket count is a corpus-sized (but slim, ~40-byte-row) shuffle.
  * The scale escape is to persist the banded rows and running bucket
  * counts next to the signature store (updated by the same
  * exactly-once append discipline) so a batch pays O(batch) bands +
  * one bucketed probe join; that store layout is not implemented here
  * — batch sizes in this engine's tests make the recompute the simpler
  * correct choice.
  *
  * Exactly-once across foreachBatch replays (a batch re-runs whenever
  * the checkpoint commit didn't land):
  *  - store rows carry `ingest_batch`; the delta is computed against
  *    the store EXCLUDING the current batch id, so a replay whose
  *    previous attempt already appended sees the identical pre-batch
  *    store and recomputes the identical delta — not an empty one;
  *  - the pairs sink is hive-partitioned by `ingest_batch` and written
  *    with dynamic partition overwrite, so a replay overwrites its own
  *    partition with identical content instead of appending twice;
  *  - the store append is the J11 anti-join on doc_id — idempotent by
  *    construction.
  * Write order (pairs before store) makes the intermediate crash
  * states recoverable: pairs-written/store-missing replays to the same
  * pairs; both-written replays to the same both.
  *
  * The accumulated pairs sink equals a full-corpus run per ingest
  * state — see the cap caveat on [[Dedup.lshCandidatePairsIncremental]]:
  * pairs emitted before a bucket grew past the hot-bucket cap persist,
  * where a from-scratch run would drop that bucket entirely.
  */
object DedupStream {

  /** One micro-batch (exposed directly so replay semantics are
    * testable without a streaming harness). `maxStoreFiles` bounds the
    * signature store's small-file growth: each append adds ~one part
    * file per shuffle partition, so after the store write the batch
    * runs [[compactStore]] when the committed file count exceeds the
    * bound — otherwise a long-lived stream makes every later probe pay
    * thousands of file opens. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, storePath: String,
                   pairsPath: String, maxStoreFiles: Int = 256): Unit = {
    val spark = batch.sparkSession
    recoverCompaction(spark, storePath) // heal a compaction crash first
    val sig = Dedup.minhashSignaturesFor(batch, idCol, textCol)
    // Committed-data check, not bare path existence: a crash inside
    // the very first store append can leave storePath holding only an
    // uncommitted _temporary dir, and reading that throws "unable to
    // infer schema" on every replay — the batch would be permanently
    // stuck instead of recovering to the empty-store branch.
    val storePrev =
      if (!graft.FsUtils.committedExists(spark, storePath)) sig.limit(0)
      else spark.read.parquet(storePath)
        .filter(col("ingest_batch") =!= batchId).drop("ingest_batch")
    // anti-join also collapses same-batch re-deliveries of a doc the
    // store already holds (at-least-once ingest)
    val delta = sig
      .join(storePrev.select("doc_id"), Seq("doc_id"), "left_anti")
      .persist()
    try {
      Dedup.lshCandidatePairsIncremental(storePrev, delta)
        .withColumn("ingest_batch", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .option("compression", "zstd").parquet(pairsPath)
      graft.etl.StarSchemaBuilder.appendUnique(spark,
        delta.withColumn("ingest_batch", lit(batchId)),
        storePath, Seq("doc_id"))
    } finally delta.unpersist()
    compactStore(spark, storePath, maxStoreFiles)
  }

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path) =
    fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Signature-store small-file maintenance. When the committed data
    * file count exceeds `maxFiles`, rewrite the store coalesced to
    * ~`targetFileBytes` per file and swap the fresh copy in (write to
    * a side dir, then two renames — in-place overwrite of a dataset
    * being read is unsafe, same rationale as
    * [[graft.etl.StarSchemaBuilder.compactPartitions]]). Content is
    * byte-for-byte the same rows, so replay idempotence is untouched.
    * Crash safety: the store is only ever absent between the two
    * renames, and [[recoverCompaction]] (run at every batch start)
    * restores whichever complete copy exists — the fresh one if its
    * write committed, the original otherwise. The rename pair is not
    * atomic on object stores; a concurrent reader can hit the gap —
    * acceptable for the store's single-writer micro-batch discipline,
    * where the only reader is the next batch. Returns true if a
    * compaction ran. */
  def compactStore(spark: SparkSession, storePath: String,
                   maxFiles: Int = 256,
                   targetFileBytes: Long = 128L << 20): Boolean = {
    if (!graft.FsUtils.committedExists(spark, storePath)) return false
    val (fs, p) = fsOf(spark, storePath)
    val files = dataFiles(fs, p)
    if (files.length <= maxFiles) return false
    val totalBytes = files.map(_.getLen).sum
    val target = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(storePath + CompactTmpSuffix)
    fs.delete(tmp, true)
    spark.read.parquet(storePath).repartition(target)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(storePath + CompactOldSuffix)
    fs.delete(old, true)
    if (!fs.rename(p, old))
      sys.error(s"compactStore: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore the original before failing
      sys.error(s"compactStore: rename $tmp -> $p failed")
    }
    fs.delete(old, true)
    true
  }

  private val CompactTmpSuffix = ".compacting"
  private val CompactOldSuffix = ".old"

  /** Heal a crashed [[compactStore]]: if the store dir is missing,
    * promote the committed fresh copy (crash between the renames) or
    * restore the displaced original (rename-back also lost); if the
    * store exists, drop any leftover side dirs from an earlier crash
    * (an uncommitted `.compacting` from a mid-write crash is residue,
    * not data). */
  def recoverCompaction(spark: SparkSession, storePath: String): Unit = {
    val (fs, p) = fsOf(spark, storePath)
    val tmp = new org.apache.hadoop.fs.Path(storePath + CompactTmpSuffix)
    val old = new org.apache.hadoop.fs.Path(storePath + CompactOldSuffix)
    if (!fs.exists(p)) {
      if (graft.FsUtils.committedExists(spark, tmp.toString)) fs.rename(tmp, p)
      else if (fs.exists(old)) fs.rename(old, p)
    }
    if (fs.exists(p)) { fs.delete(tmp, true); fs.delete(old, true) }
  }

  /** Attach the incremental dedup to a document stream. */
  def run(docsStream: DataFrame, idCol: String, textCol: String,
          storePath: String, pairsPath: String,
          checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, storePath, pairsPath)
      }
      .start()

}
