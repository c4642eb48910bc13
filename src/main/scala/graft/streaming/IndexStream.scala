package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the text-search twin of the
  * sketch/CDC stores: each micro-batch of NEW documents lands its
  * posting rows under `postings/ingest_batch=<id>/bucket=<b>/` and a
  * one-row corpus-stats partial under `stats/ingest_batch=<id>/`,
  * both with the dynamic-overwrite replay discipline (an
  * at-least-once replay rewrites exactly its own partitions). The
  * probe then reads across ALL ingest batches with the same
  * bucket-level partition pruning, re-derives the probed terms' df
  * from the pruned postings themselves, and folds the mergeable
  * (n_docs, sum_dl) stats partials — so a probe after N batches is
  * IDENTICAL to probing a batch-built index of the union corpus
  * (IndexStreamSpec pins stream ≡ batch ≡ corpus scan, and replay).
  *
  * Contract: batches carry NEW documents only (the snapshot-diff
  * `added` stream, as with [[graft.operators.Retrieval
  * .appendTextIndex]]); re-ingesting a doc under a different batch id
  * would double its postings — that dedup belongs to the upstream
  * exact-dedup/diff stage, not the index.
  *
  * Scale: per batch the corpus is tokenized once and only O(batch)
  * posting rows are written; no store is ever rewritten, so batch
  * cost is independent of index size. The probe's df re-derivation
  * reads only the probed buckets (posting-list-sized), and the stats
  * fold reads one slim row per batch.
  */
object IndexStream {

  /** The stats row doubles as the batch's COMMIT MARKER: postings
    * land first, the stats partial second, and [[probeTopK]] scores
    * ONLY batches whose stats row exists — a probe racing a
    * mid-flight batch (or a replay) sees a consistent pre-batch
    * index, never postings scored against a stats fold that excludes
    * them. */
  def processBatch(docsBatch: DataFrame, batchId: Long, dir: String,
                   idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // materialize: a micro-batch is batch-sized, so tokenizing once
    // for the stats agg + postings write is the right trade here
    val (staged, postings) =
      Retrieval.stagePostings(docsBatch, idCol, textCol, materialize = true)
    val add = staged
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")).head()
    if (add.getLong(0) == 0) return // empty batch: nothing to index
    postings.withColumn("ingest_batch", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "bucket")
      .option("compression", "zstd")
      .parquet(s"$dir/postings")
    val spark = docsBatch.sparkSession
    import spark.implicits._
    Seq((add.getLong(0), add.getLong(1), batchId))
      .toDF("n_docs", "sum_dl", "ingest_batch")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(s"$dir/stats")
  }

  /** BM25 top-k across every ingested batch: pruned postings reads,
    * df re-derived from the probed rows, stats folded from the
    * mergeable partials — then the one shared scoring tail. */
  def probeTopK(spark: SparkSession, dir: String, terms: Seq[String],
                topK: Int): DataFrame = {
    // pre-first-commit (stream starting up, or only empty batches so
    // far): an empty result, not a PATH_NOT_FOUND — the
    // CdcStream.snapshot / TrainStream.enteringWeights convention
    if (!graft.FsUtils.committedExists(spark, s"$dir/stats"))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
    val buckets = terms.map(Retrieval.bucketOf).distinct.map(lit(_))
    val termLits = terms.map(lit(_))
    // committed = batches with a stats row (the commit marker); the
    // id set is one slim row per batch and becomes a postings
    // PARTITION filter, so an uncommitted batch's postings are
    // never scored
    val statsRows = spark.read.parquet(s"$dir/stats")
    val committed = statsRows
      .select(col("ingest_batch").cast("long")) // partition col infers int
      .collect().map(r => lit(r.getLong(0)))
    val posts = spark.read.parquet(s"$dir/postings")
      .filter(col("ingest_batch").isin(committed: _*))
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(termLits: _*))
      .select("doc_id", "dl", "token", "tf")
    val tstats = posts.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = statsRows
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    Retrieval.scoreTopK(posts, tstats, stats, terms, topK)
  }

  /** Attach the index maintenance to a documents-shaped stream. */
  def run(docsStream: DataFrame, dir: String, checkpoint: String)
      : StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir)
      }
      .start()
}
