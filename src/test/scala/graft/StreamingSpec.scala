package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamingUpsert

/** Streaming stretch (SURVEY §2.11 / §7.2-8): the foreachBatch upsert
  * over the events table must converge to exactly the batch result and
  * stay idempotent when the same files are replayed. */
class StreamingSpec extends SparkSpec {

  test("streaming upsert over events == batch distinct-by-uid result") {
    val work = Files.createTempDirectory("graft_stream").toString
    val inDir = s"$work/in"
    new java.io.File(inDir).mkdirs()
    // split events into 3 files → 3 deterministic micro-batches
    val events = Tables.load(spark, sf0001, "events")
    events.withColumn("bucket", col("event_id") % 3)
      .write.partitionBy("bucket").parquet(s"$work/split")
    (0 to 2).foreach { b =>
      val src = new java.io.File(s"$work/split/bucket=$b")
      src.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          Files.copy(f.toPath,
            new java.io.File(s"$inDir/part_${b}_$i.parquet").toPath)
        }
    }

    val outPath = s"$work/out"
    // events span months of event-time across the 3 micro-batches; a
    // span-covering lateness bound keeps every row on-time for the
    // batch-parity check
    val q = StreamingUpsert.run(spark, inDir, outPath, s"$work/ckpt",
      lateness = "3650 days")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
    val batch = StreamingUpsert.eventFeed(spark.read.parquet(inDir))
      .dropDuplicates("fact_uid")
    assert(streamed.count() == batch.count())
    assert(streamed.select("fact_uid").distinct().count() == streamed.count())

    // replay the same input through a fresh stream → no new rows
    val q2 = StreamingUpsert.run(spark, inDir, outPath, s"$work/ckpt2",
      lateness = "3650 days")
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(outPath).count() == batch.count(),
      "replay must be a no-op (idempotent upsert)")
  }
}
