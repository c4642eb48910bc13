package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Sketches

/** Streaming fold of HyperLogLog register tables — the serving-layer
  * answer to "distinct users per slice, updated per micro-batch,
  * without ever rescanning the corpus".
  *
  * Store layout mirrors [[DedupStream]]'s log-structured bucket-count
  * partials: each micro-batch writes its OWN register partial under
  * `ingest_batch=<id>` with dynamic partition overwrite, so an
  * at-least-once replay of a batch rewrites exactly its own partition
  * — exactly-once content without a transaction log. When partials
  * pile up, [[foldRegisters]] collapses all non-current partitions
  * into an `ingest_batch=-1` sentinel via the same two-rename publish
  * as [[DedupStream.compactStore]] (crash at any point leaves a
  * recoverable copy; [[DedupStream.recoverCompaction]] heals it at
  * the next batch start).
  *
  * On top of that discipline HLL adds a property the dedup stores
  * don't have: the merge is per-cell MAX, so even a DOUBLE ingestion
  * of the same rows (replay races, log duplication, re-folding) can
  * never change an estimate — idempotence is algebraic, not just
  * protocol-level. SketchStreamSpec pins both layers separately.
  *
  * Scale: a batch's partial is at most |keys|·m rows regardless of
  * batch width, the estimate reads only the (geometry-bounded) store,
  * and the fold is a shuffle of the store, never of any corpus data.
  */
object SketchStream {

  /** One micro-batch: build the batch's register partial and publish
    * it under its batch id. Exposed directly (like
    * [[DedupStream.processBatch]]) so replay semantics are testable
    * without a streaming harness. */
  def processBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
                   valueCol: String, registersPath: String,
                   maxPartials: Int = 16): Unit = {
    val spark = batch.sparkSession
    DedupStream.recoverCompaction(spark, registersPath)
    Sketches.hllRegisters(batch, keyCols, valueCol)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .option("compression", "zstd")
      .parquet(registersPath)
    foldRegisters(spark, registersPath, batchId, keyCols, maxPartials)
  }

  /** Collapse accumulated per-batch partials into the `-1` sentinel
    * partition once more than `maxPartials` partitions exist. The
    * current batch's partition is kept unfolded so its replay can
    * still dynamic-overwrite itself. Max-merge makes the fold
    * content-neutral by construction. */
  def foldRegisters(spark: SparkSession, registersPath: String,
                    currentBatchId: Long, keyCols: Seq[String],
                    maxPartials: Int = 16): Boolean = {
    if (!graft.FsUtils.committedExists(spark, registersPath)) return false
    val (fs, p) = DedupStream.fsOf(spark, registersPath)
    val partitions = fs.listStatus(p).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("ingest_batch=")
    }
    if (partitions.length <= maxPartials) return false
    val current = spark.read.parquet(registersPath)
      .filter(col("ingest_batch") === currentBatchId)
    val folded = spark.read.parquet(registersPath)
      .filter(col("ingest_batch") =!= currentBatchId)
      .groupBy(keyCols.head, (keyCols.tail :+ "reg_idx"): _*)
      .agg(max(col("reg_rank")).as("reg_rank"))
      .withColumn("ingest_batch", lit(-1L))
    val tmp = new org.apache.hadoop.fs.Path(
      registersPath + DedupStream.CompactTmpSuffix)
    fs.delete(tmp, true)
    folded.unionByName(current.select(folded.columns.map(col): _*))
      .write.mode(SaveMode.Overwrite).partitionBy("ingest_batch")
      .option("compression", "zstd").parquet(tmp.toString)
    DedupStream.swapDirs(fs, p, tmp)
    true
  }

  /** The live register table: all partials max-merged. Cheap — the
    * store is cell-grain, not corpus-grain. */
  def readRegisters(spark: SparkSession, registersPath: String,
                    keyCols: Seq[String]): DataFrame =
    spark.read.parquet(registersPath).drop("ingest_batch")
      .groupBy(keyCols.head, (keyCols.tail :+ "reg_idx"): _*)
      .agg(max(col("reg_rank")).as("reg_rank"))

  /** Serving-side distinct estimates from the store as of now. */
  def estimate(spark: SparkSession, registersPath: String,
               keyCols: Seq[String]): DataFrame =
    Sketches.hllEstimate(readRegisters(spark, registersPath, keyCols),
      keyCols)

  /** Attach the register fold to a stream. */
  def run(stream: DataFrame, keyCols: Seq[String], valueCol: String,
          registersPath: String, checkpoint: String,
          maxPartials: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, keyCols, valueCol, registersPath,
          maxPartials)
      }
      .start()
}
