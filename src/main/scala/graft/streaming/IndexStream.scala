package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the text-search twin of the
  * sketch/CDC stores, and since round 9 a THIN shim over the one
  * generational index implementation in [[Retrieval]]: each
  * micro-batch of NEW documents is one [[Retrieval.ingestGeneration]]
  * call at generation `streamBase + batchId` — postings land
  * first under `postings/ingest_batch=<gen>/bucket=<b>/`, the one-row
  * mergeable stats partial (the COMMIT MARKER) lands last, and an
  * at-least-once replay clears and rewrites exactly its own
  * generation. The probes ([[probeTopK]] here,
  * [[Retrieval.probeIndexTopK]]/[[Retrieval.probePhrase]] for batch
  * callers) are the SAME code path, so a probe after N batches is
  * IDENTICAL to probing a batch-built index of the union corpus
  * (IndexStreamSpec pins stream ≡ batch ≡ corpus scan, and replay) —
  * and a batch probe pointed at a stream-maintained dir can never
  * disagree with the streamed probe about which batches exist.
  *
  * Contract: batches carry NEW documents only (the snapshot-diff
  * `added` stream, as with [[Retrieval.appendTextIndex]]);
  * re-ingesting a doc under a different batch id would double its
  * postings — that dedup belongs to the upstream exact-dedup/diff
  * stage, not the index.
  *
  * Scale: per batch the delta is tokenized once and only O(batch)
  * posting rows are written, so batch cost is independent of index
  * size — EXCEPT the amortized compaction share:
  * [[Retrieval.compactTextIndex]]'s two-level LSM folds recent batch
  * generations into a fresh sentinel run once more than `maxPartials`
  * stats rows exist (marker-last commit, O(recent) per minor fold;
  * sentinel runs themselves fold only in the rare major pass), so
  * probe planning cost — the stats read, the generation partition
  * filter, and the postings file listing — stays BOUNDED over the
  * stream's lifetime instead of growing one partition per batch
  * forever. The in-flight batch is always kept unfolded so its
  * replay discipline survives compaction.
  */
object IndexStream {

  /** The stream's generation band starts above every generation
    * committed when the stream FIRST touched the index (a
    * [[Retrieval.writeTextIndex]] seed's 0, any
    * [[Retrieval.appendTextIndex]] generations since): the base is
    * derived once, persisted beside the index, and re-read forever
    * after — the exact [[VectorIndexStream]] discipline. Without it,
    * micro-batch ids 0/1/2… would REUSE committed generation ids on a
    * seeded index and `ingestGeneration`'s orphan-clearing overwrite
    * would silently drop the pre-stream corpus. The persisted marker
    * (not a recomputation per batch) keeps replays deterministic: a
    * restarted batch maps to the SAME generation while never
    * colliding with pre-stream ones. One logical stream per index
    * (same checkpoint across restarts) — the single-writer contract
    * every maintenance path here assumes. */
  private def streamBase(spark: SparkSession, dir: String): Long = {
    val marker = s"$dir/_stream_base"
    graft.FsUtils.readString(spark, marker) match {
      case Some(v) => v.trim.toLong
      case None =>
        val base = graft.operators.GenStore.nextGen(spark, s"$dir/stats")
        graft.FsUtils.writeString(spark, marker, base.toString)
        base
    }
  }

  /** One micro-batch: ingest under the commit-marker protocol, then
    * fold old generations when they pile up. */
  def processBatch(docsBatch: DataFrame, batchId: Long, dir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxPartials: Int = 16): Unit = {
    val spark = docsBatch.sparkSession
    DedupStream.recoverCompaction(spark, s"$dir/postings")
    DedupStream.recoverCompaction(spark, s"$dir/stats")
    val gen = streamBase(spark, dir) + batchId
    Retrieval.ingestGeneration(docsBatch, idCol, textCol, dir, gen)
    Retrieval.compactTextIndex(spark, dir, protectGen = gen,
      maxPartials = maxPartials)
  }

  /** BM25 top-k across every committed generation — the shared
    * [[Retrieval.probeIndexTopK]] (pruned postings reads, df
    * re-derived from the probed rows, mergeable stats fold, one
    * scoring tail). Pre-first-commit (stream starting up, or only
    * empty batches so far) answers an empty frame, not
    * PATH_NOT_FOUND — the CdcStream.snapshot convention. */
  def probeTopK(spark: SparkSession, dir: String, terms: Seq[String],
                topK: Int): DataFrame =
    Retrieval.probeIndexTopK(spark, dir, terms, topK)

  /** Attach the index maintenance to a documents-shaped stream. */
  def run(docsStream: DataFrame, dir: String, checkpoint: String,
          maxPartials: Int = 16): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, maxPartials = maxPartials)
      }
      .start()
}
