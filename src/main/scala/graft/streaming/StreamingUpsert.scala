package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.StarSchemaBuilder

/** Structured Streaming variant of the incremental batch upsert
  * (SURVEY §2.11): the reference makes incremental batches idempotent
  * with deterministic uids + anti-join insert (prod_etl/ETL_1.py:450-498,
  * Data_Schema.md:356-361); here the same upsert runs per micro-batch
  * via foreachBatch, with event-time watermark +
  * dropDuplicatesWithinWatermark as the in-flight dedup stage.
  *
  * Scale notes: watermark-scoped dedup state holds only uids until the
  * watermark passes their event time (bounded by the lateness window);
  * the sink-side anti-join reads just the slim uid projection of
  * the existing data. Parallelism and partition layout are identical to
  * the batch path because foreachBatch reuses the exact batch writer.
  */
object StreamingUpsert {

  /** The `events` table viewed as a rate-change feed with an event-time
    * column and a deterministic uid. `ts` encodings vary by producer —
    * int64 epoch-nanos (read as long under legacy.parquet.nanosAsLong)
    * or a parquet TIMESTAMP (MICROS/NANOS, tz-less arrives as NTZ) —
    * so the feed normalizes from the OBSERVED type instead of baking
    * one contract in. Sessions run UTC, so the NTZ→timestamp cast is
    * exact. */
  def eventFeed(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val eventTime = df.schema("ts").dataType match {
      case LongType =>
        timestamp_seconds(col("ts") / lit(1000000000L))
      case TimestampType | TimestampNTZType =>
        col("ts").cast(TimestampType)
      // Fail loudly on anything else: a silent cast would misread a
      // new encoding (e.g. int64 MILLIS would divide as nanos and land
      // in 1970) and windows/watermarks would go quietly wrong.
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts encoding $other — extend eventFeed")
    }
    df.select(
      eventTime.as("event_time"),
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      md5(concat_ws("|", col("event_id"), col("event_type"))).as("fact_uid"))
  }

  /** Read a parquet directory as a stream (one-file-per-trigger keeps
    * micro-batches deterministic in tests). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    eventFeed(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir))
  }

  /** Watermarked in-flight dedup + per-batch idempotent upsert into a
    * parquet dataset at `outPath`.
    *
    * `lateness` bounds the dedup state AND defines how old an event may
    * arrive before being discarded as late. The dedup must be
    * `dropDuplicatesWithinWatermark`: a plain dropDuplicates(uid) never
    * evicts its state (the uid key carries no event time), so state would
    * grow unbounded; the WithinWatermark variant expires each uid once
    * the watermark passes its event time. Size `lateness` to the
    * source's real out-of-orderness; the sink-side anti-join still
    * guarantees idempotence for whatever passes. */
  def run(spark: SparkSession, inDir: String, outPath: String,
          checkpoint: String, lateness: String = "1 hour"): StreamingQuery =
    readEventStream(spark, inDir)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("fact_uid")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        StarSchemaBuilder.appendUnique(spark, batch, outPath, Seq("fact_uid"))
      }
      .start()
}
