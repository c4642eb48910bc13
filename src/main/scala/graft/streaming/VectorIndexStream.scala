package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{GenStore, Similarity}

/** Streaming IVF-index maintenance — the vector twin of
  * [[IndexStream]], and the same thin shim over the [[GenStore]]
  * protocol: each micro-batch of NEW vectors is one
  * `ingestVectorGeneration` call with the micro-batch id as the
  * generation (bucket assignment under the index's persisted sidecar
  * centroids — never recomputed, so bucket membership stays
  * consistent with the rows already on disk), the per-generation
  * marker row commits LAST, and an at-least-once replay clears and
  * rewrites exactly its own generation. Probes are the unchanged
  * batch probes ([[Similarity.probeIvfIndex]]) — they already read
  * committed generations only, so stream-maintained and
  * batch-appended indexes are indistinguishable to a reader.
  *
  * Contract: batches carry NEW vector ids only (the snapshot-diff
  * `added` stream, as with every append path in this library);
  * re-ingesting an id under a different batch id would duplicate it
  * in the index — that dedup belongs upstream.
  *
  * Scale: per batch only O(batch) rows are assigned and written;
  * [[Similarity.compactIvfIndex]] runs per batch with the in-flight
  * generation protected, so probe planning stays bounded over the
  * stream's lifetime. Centroid drift under a growing corpus degrades
  * recall, never correctness — nprobe compensates, and a rebuild
  * ([[Similarity.writeIvfIndex]]) re-centers when drift warrants.
  */
object VectorIndexStream {

  /** The stream's generation band starts above every generation
    * committed when the stream FIRST touched the index (the seed
    * build's 0, any batch appends since): the base is derived once,
    * persisted beside the index, and re-read forever after, so a
    * replayed or restarted batch maps to the SAME generation (the
    * replay contract needs determinism) while never colliding with
    * pre-stream generations. One logical stream per index (same
    * checkpoint across restarts) — the single-writer contract every
    * maintenance path here assumes. */
  private def streamBase(spark: SparkSession, indexPath: String): Long = {
    val marker = s"${indexPath}_stream_base"
    graft.FsUtils.readString(spark, marker) match {
      case Some(v) => v.trim.toLong
      case None =>
        val base = GenStore.nextGen(spark, Similarity.gensPathOf(indexPath))
        graft.FsUtils.writeString(spark, marker, base.toString)
        base
    }
  }

  def processBatch(vecBatch: DataFrame, batchId: Long, indexPath: String,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   maxPartials: Int = 16): Unit = {
    val spark = vecBatch.sparkSession
    val gensPath = Similarity.gensPathOf(indexPath)
    require(graft.FsUtils.committedExists(spark,
      Similarity.centroidsPathOf(indexPath)),
      "no centroid sidecar — seed the index with writeIvfIndex (or an " +
        "empty-corpus build) before streaming into it")
    // a centroids-only dir (a seed build that died before its marker,
    // or a hand-copied sidecar) must fail with the same explicit
    // instruction appendIvfIndex gives, not a raw PATH_NOT_FOUND from
    // the marker-store read inside streamBase
    require(graft.FsUtils.committedExists(spark, gensPath),
      s"no generation markers at $gensPath — rebuild with writeIvfIndex")
    DedupStream.recoverCompaction(spark, indexPath)
    DedupStream.recoverCompaction(spark, gensPath)
    val gen = streamBase(spark, indexPath) + batchId
    Similarity.ingestVectorGeneration(spark, indexPath, vecBatch,
      idCol, vecCol, gen)
    Similarity.compactIvfIndex(spark, indexPath, protectGen = gen,
      maxPartials = maxPartials)
  }

  /** Serving-side probe across every committed generation — the one
    * shared batch probe. */
  def probeTopK(spark: SparkSession, dir: String, indexPath: String,
                nprobe: Int = 2, topK: Int = 5): DataFrame =
    Similarity.probeIvfIndex(spark, dir, indexPath, nprobe, topK)

  /** Attach the index maintenance to a vectors-shaped stream. */
  def run(vecStream: DataFrame, indexPath: String, checkpoint: String,
          maxPartials: Int = 16): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, maxPartials = maxPartials)
      }
      .start()
}
