package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC snapshot maintenance — the streaming twin of the
  * batch `cdc_apply` query: a keyed change stream (every row upserts
  * its key; a tombstone op deletes it) folded into a current-snapshot
  * store, one micro-batch at a time.
  *
  * The fold is a per-key `max(struct(version, op, value))`. That
  * merge is ASSOCIATIVE and IDEMPOTENT, which puts this stream in the
  * HLL/KMV class of the store discipline: batches collapse to
  * key-grain partials under `ingest_batch=<id>` (dynamic-overwrite
  * replay safety), but even a DOUBLE ingestion of the same rows —
  * replay races, log duplication, re-folding — cannot move the
  * snapshot, because max-merging a state with itself is a no-op.
  * CdcStreamSpec pins both layers separately, mirroring
  * SketchStreamSpec's honest distinction.
  *
  * Tombstones are data, not deletions, inside the store: the winning
  * (version, op) per key decides at READ time whether the key is
  * absent from the snapshot. Physically deleting on ingest would
  * break idempotence (a replayed earlier batch could resurrect the
  * key); keeping the tombstone row makes the fold order-free.
  *
  * Scale: a batch's partial is one slim row per DISTINCT key in the
  * batch (not per change), the store compacts under the same `-1`
  * sentinel fold as the sketch stores, and the snapshot read is a
  * key-grain aggregate over the geometry of the key space — never the
  * change history.
  */
object CdcStream {

  /** Key-grain partial of one change batch: the winning change per
    * key within the batch, carried as ONE struct column `m` so the
    * shared sentinel fold ([[SketchStream.foldStore]]) applies
    * directly with `max` as the merge. `changes` carries (user_id,
    * version, op, value) rows; version must be unique per key (a
    * total order). */
  def batchPartial(changes: DataFrame): DataFrame =
    changes.groupBy("user_id")
      .agg(max(struct(col("version"), col("op"), col("value"))).as("m"))

  /** Publish one micro-batch's partial under its batch id, folding
    * old partials into the sentinel partition when they pile up. */
  def processBatch(changes: DataFrame, batchId: Long, storePath: String,
                   maxPartials: Int = 16): Unit = {
    val spark = changes.sparkSession
    DedupStream.recoverCompaction(spark, storePath)
    batchPartial(changes).withColumn("ingest_batch", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .option("compression", "zstd")
      .parquet(storePath)
    SketchStream.foldStore(spark, storePath, batchId, Seq("user_id"),
      "m", max, maxPartials)
  }

  /** The current snapshot: max-merge the store's partials per key,
    * then drop keys whose winning op is the tombstone. */
  def snapshot(spark: SparkSession, storePath: String,
               tombstoneOp: String = "error"): DataFrame = {
    if (!graft.FsUtils.committedExists(spark, storePath))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("op",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.DoubleType))))
    spark.read.parquet(storePath)
      .groupBy("user_id").agg(max(col("m")).as("m"))
      .select(col("user_id"), col("m.version").as("version"),
        col("m.op").as("op"), col("m.value").as("value"))
      .filter(col("op") =!= tombstoneOp)
  }

  /** Attach the snapshot fold to a change stream. */
  def run(changeStream: DataFrame, storePath: String, checkpoint: String,
          maxPartials: Int = 16): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storePath, maxPartials)
      }
      .start()
}
