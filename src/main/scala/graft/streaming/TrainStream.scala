package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.Training

/** Streaming mini-batch SGD — online updates of the quality
  * classifier as new corpus slices arrive, without ever retraining
  * from scratch. Each micro-batch takes ONE [[Training.gdStep]] at
  * the store's current weights and appends the updated state, so the
  * model walks the same fixed-point-deterministic trajectory a
  * sequential driver loop would.
  *
  * Exactly-once without a transaction log, via the store discipline
  * shared with [[SketchStream]]/[[DedupStream]]: the state log is
  * partitioned by `ingest_batch`, each batch dynamic-overwrites ONLY
  * its own partition, and the entering weights are read from the
  * greatest batch id STRICTLY BELOW the current one — an
  * at-least-once replay of batch b recomputes from exactly the state
  * b−1 it saw the first time and rewrites its own row to the identical
  * values (gdStep is deterministic), so a replay can never double-step
  * the model.
  *
  * Unlike the sketch stores the state log is NOT compacted: it is one
  * slim row per batch and it IS the training curve — the serving read
  * ([[lossCurve]]) is the monitoring artifact a training pipeline
  * wants anyway.
  *
  * Scale: the per-batch work is gdStep's single map-side-combinable
  * aggregate over the batch (5 fixed-point sums + a count), the state
  * read is a metadata-sized parquet scan, and nothing ever rescans
  * prior batches.
  */
object TrainStream {

  private val StateSchema = StructType(Seq(
    StructField("w_x0", DoubleType), StructField("w_x1", DoubleType),
    StructField("w_x2", DoubleType), StructField("w_x3", DoubleType),
    StructField("loss", DoubleType), StructField("n_rows", LongType),
    StructField("ingest_batch", LongType)))

  /** Weights entering `batchId`: the state row with the greatest
    * batch id strictly below it (strictness is the replay guard — a
    * re-run must not see its own first attempt), or the zero vector
    * for the first batch. */
  def enteringWeights(spark: SparkSession, storePath: String,
                      batchId: Long): Array[Double] = {
    if (!graft.FsUtils.committedExists(spark, storePath))
      return Array.fill(4)(0.0)
    val prior = spark.read.schema(StateSchema).parquet(storePath)
      .filter(col("ingest_batch") < batchId)
      .orderBy(col("ingest_batch").desc).limit(1)
      .select("w_x0", "w_x1", "w_x2", "w_x3").collect()
    if (prior.isEmpty) Array.fill(4)(0.0)
    else (0 to 3).map(prior.head.getDouble).toArray
  }

  /** Apply one micro-batch of documents-shaped rows: one gdStep at
    * the entering weights, then publish the updated state under this
    * batch's partition. */
  def processBatch(docsBatch: DataFrame, batchId: Long, storePath: String,
                   lr: Double = 0.5): Unit = {
    val spark = docsBatch.sparkSession
    val w0 = enteringWeights(spark, storePath, batchId)
    // no checkpoint: unlike the batch trainer's LrIters reuse, the
    // stream runs ONE gdStep aggregate per batch — materializing the
    // features would add a full extra pass for zero reuse
    val (w1, loss, n) = Training.gdStep(
      Training.featuresOf(docsBatch), w0, lr)
    // an empty micro-batch (replay after restart, empty trigger) is a
    // no-op: no state row — a zero-row "loss 0.0" entry would corrupt
    // the training curve, and the identity step carries no information
    if (n == 0) return
    val row = Row(w1(0), w1(1), w1(2), w1(3), loss, n, batchId)
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), StateSchema)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(storePath)
  }

  /** Serving read: the latest weights in the store (zeros if empty). */
  def currentWeights(spark: SparkSession, storePath: String): Array[Double] =
    enteringWeights(spark, storePath, Long.MaxValue)

  /** Monitoring read: per-batch entering loss and updated weights in
    * batch order — the training curve. */
  def lossCurve(spark: SparkSession, storePath: String): DataFrame =
    spark.read.schema(StateSchema).parquet(storePath)
      .select(col("ingest_batch"), col("loss"), col("n_rows"),
        col("w_x0"), col("w_x1"), col("w_x2"), col("w_x3"))
      .orderBy("ingest_batch")

  /** Attach the trainer to a documents-shaped stream. */
  def run(docsStream: DataFrame, storePath: String, checkpoint: String,
          lr: Double = 0.5): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storePath, lr)
      }
      .start()
}
