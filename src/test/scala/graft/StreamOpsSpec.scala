package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{StreamOps, StreamingUpsert}

/** Streaming/batch parity for the windowed aggregate and the stateful
  * sessionizer. Both run in Append mode, so results only emit when the
  * watermark closes a window/session — the specs push the watermark
  * with a far-future sentinel file written AFTER the real data is
  * processed, then compare against the batch twins. */
class StreamOpsSpec extends SparkSpec {

  /** Write events as 3 time-ordered files (disjoint event-time ranges,
    * increasing mtimes) so maxFilesPerTrigger=1 yields monotone
    * micro-batches, then return (inDir, realFeedBatch). */
  private def timeOrderedInput(work: String): String = {
    val inDir = s"$work/in"
    new java.io.File(inDir).mkdirs()
    val events = Tables.load(spark, sf0001, "events")
    val feed = StreamingUpsert.eventFeed(events)
    val cuts = feed.select(col("event_time").cast("long").as("t"))
      .stat.approxQuantile("t", Array(0.33, 0.66), 0.001).map(_.toLong)
    val buckets = Seq(
      col("event_time").cast("long") <= cuts(0),
      col("event_time").cast("long") > cuts(0) &&
        col("event_time").cast("long") <= cuts(1),
      col("event_time").cast("long") > cuts(1))
    buckets.zipWithIndex.foreach { case (cond, i) =>
      val tmp = s"$work/b$i"
      events.join(feed.filter(cond).select("event_id").distinct(),
        Seq("event_id"), "left_semi").coalesce(1).write.parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$inDir/batch_$i.parquet")
      Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    inDir
  }

  /** A single far-future event (event_id -1) that pushes the watermark
    * past everything real + any gap/window. */
  private def writeSentinel(inDir: String): Unit = {
    import spark.implicits._
    val far = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    // ts must match the encoding of the files ALREADY in `inDir` (the
    // sentinel shares their directory and schema inference): epoch-
    // nanos long for the int64 layout, or a cast to the observed
    // timestamp type.
    val rawTs = spark.read.parquet(inDir).schema("ts").dataType
    val tsCol = rawTs match {
      case org.apache.spark.sql.types.LongType =>
        (col("event_time").cast("long") * lit(1000000000L)).as("ts")
      case dt => col("event_time").cast(dt).as("ts")
    }
    val sentinel = Seq((-1L, -1L, "___sentinel", 0.0, far))
      .toDF("event_id", "user_id", "event_type", "value", "event_time")
      .select(col("event_id"), tsCol,
        col("user_id"), col("event_type"), col("value"))
    val tmp = inDir + "_sentinel"
    sentinel.coalesce(1).write.parquet(tmp)
    val src = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(s"$inDir/zz_sentinel.parquet")
    Files.copy(src.toPath, dst.toPath)
    dst.setLastModified(1700000000000L + 10 * 60000L)
  }

  test("watermarked windowed agg emits exactly the batch windows") {
    val work = Files.createTempDirectory("graft_winagg").toString
    val inDir = timeOrderedInput(work)
    val outPath = s"$work/out"
    val q = StreamOps.windowedCounts(
      StreamingUpsert.readEventStream(spark, inDir), "30 days", "1 minute")
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    writeSentinel(inDir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
      .filter(col("event_type") =!= "___sentinel")
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.windowedCountsBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir))
        .filter(col("event_type") =!= "___sentinel"), "30 days")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} windows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join == static twin") {
    val work = Files.createTempDirectory("graft_ssij").toString
    val inDir = timeOrderedInput(work)
    val gapMs = 24L * 3600 * 1000 // 24h window → a meaningful pair set
    val outPath = s"$work/out"
    val q = StreamOps.intervalJoinStream(
      StreamingUpsert.readEventStream(spark, inDir), gapMs, "1 minute")
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.intervalJoinBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir)), gapMs)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs vs batch ${batch.size}")
    assert(streamed.nonEmpty, "no pairs — widen the gap or fix the feed")
  }

  test("stateful sessionization == batch gap-session twin") {
    val work = Files.createTempDirectory("graft_sess").toString
    val inDir = timeOrderedInput(work)
    val gapMs = 30L * 24 * 3600 * 1000 // 30-day gap
    val outPath = s"$work/out"
    val q = StreamOps.sessionize(
      StreamingUpsert.readEventStream(spark, inDir), gapMs, "1 minute")
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    writeSentinel(inDir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
      .filter(col("user_id") =!= -1L)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.sessionizeBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir))
        .filter(col("user_id") =!= -1L), gapMs)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions vs batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops cross-batch re-deliveries exactly once") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_sdedup").toString
    val inDir = s"$work/in"
    new java.io.File(inDir).mkdirs()
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    def write(ids: Seq[Long], batch: Int): Unit = {
      ids.map(i => (i, (baseUs + i * 1000000L) * 1000L, i % 3,
          "rate_change", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(s"$work/b$batch")
      val src = new java.io.File(s"$work/b$batch").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$inDir/batch_$batch.parquet")
      Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + batch * 60000L)
    }
    // batch 1 re-delivers ids 5-9 (same payload, inside the lateness
    // window) — the exact failure mode of at-least-once ingest
    write(0L to 9L, 0)
    write(5L to 14L, 1)

    val outPath = s"$work/out"
    val q = StreamOps.dedupStream(
      StreamingUpsert.readEventStream(spark, inDir), "10 minutes")
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    q.stop()

    val streamedIds = spark.read.parquet(outPath)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    // each id exactly once — re-deliveries dropped, nothing lost
    assert(streamedIds.sorted == (0L to 14L),
      s"got ${streamedIds.sorted.mkString(",")}")
    val batchIds = StreamOps.dedupStreamBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir)))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamedIds.toSet == batchIds)
  }

  test("sessionization parity holds for sub-second gaps (microseconds)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_sess_us").toString
    val inDir = s"$work/in"
    new java.io.File(inDir).mkdirs()
    // user 1 at +0µs, +400000µs, +900100µs, +2000000µs with gapMs=500:
    // gaps are 400.0ms (stay), 500.1ms (split), 1099.9ms (split) → 3
    // sessions. A seconds-truncated gap computation sees 0/0/2000 ms
    // and merges the first three events — this is the regression test
    // for exactly that bug.
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val offsets = Seq(0L, 400000L, 900100L, 2000000L)
    offsets.zipWithIndex.map { case (off, i) =>
      (i.toLong, (baseUs + off) * 1000L, 1L, "rate_change", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$work/b0")
    val src = new java.io.File(s"$work/b0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(s"$inDir/batch_0.parquet")
    Files.copy(src.toPath, dst.toPath)
    dst.setLastModified(1700000000000L)

    val gapMs = 500L
    val outPath = s"$work/out"
    val q = StreamOps.sessionize(
      StreamingUpsert.readEventStream(spark, inDir), gapMs, "1 minute")
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    writeSentinel(inDir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outPath)
      .filter(col("user_id") =!= -1L)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.sessionizeBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir))
        .filter(col("user_id") =!= -1L), gapMs)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions vs batch ${batch.size}")
    assert(batch.size == 3, s"expected 3 sub-second sessions, got $batch")
    assert(batch.toSeq.map(_(3).asInstanceOf[Int]).sum == 4)
  }

  test("stateful markov transitions chain across micro-batches == batch twin") {
    val work = Files.createTempDirectory("graft_markov").toString
    val inDir = timeOrderedInput(work)
    val outPath = s"$work/out"
    // no watermark sentinel: transitions emit the moment their second
    // event arrives (NoTimeout + Append)
    val q = StreamOps.markovTransitions(
      StreamingUpsert.readEventStream(spark, inDir))
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    q.stop()

    // transitions repeat per user — compare the MULTISET via counts,
    // which is also exactly the declared query's matrix grain
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id", "from_type", "to_type").count()
      .collect().map(_.toSeq).toSet
    val streamed = counts(spark.read.parquet(outPath))
    val batch = counts(StreamOps.markovTransitionsBatch(
      StreamingUpsert.eventFeed(spark.read.parquet(inDir))))
    assert(streamed == batch,
      s"streamed ${streamed.size} transition keys vs batch ${batch.size}")
    assert(streamed.nonEmpty)
    // cross-batch chaining actually happened: without state carry the
    // stream would emit (n_events - n_users_per_batch * n_batches)
    // transitions, strictly fewer than the batch twin's
    val nStreamTrans = spark.read.parquet(outPath).count()
    val feed = StreamingUpsert.eventFeed(spark.read.parquet(inDir))
    val expected = feed.count() - feed.select("user_id").distinct().count()
    assert(nStreamTrans == expected,
      s"$nStreamTrans transitions != events - users = $expected")
  }

  test("stateful ordered funnel emits each stage once == declared batch funnel") {
    val work = Files.createTempDirectory("graft_funnel").toString
    val inDir = timeOrderedInput(work) // the sf0.001 events, 3 time cuts
    val outPath = s"$work/out"
    val q = StreamOps.funnelStages(
      StreamingUpsert.readEventStream(spark, inDir))
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").format("parquet")
      .option("path", outPath).start()
    q.processAllAvailable()
    q.stop()

    val emitted = spark.read.parquet(outPath)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // once per (user, stage) — re-emission across batches would break
    // any live funnel counter downstream
    assert(emitted.length == emitted.distinct.length, "stage re-emitted")
    val streamed = emitted.groupBy(_._2).map { case (s, g) =>
      s -> g.length.toLong
    }
    val batch = graft.queries.Analytics
      .queries("events_funnel_ordered")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"streamed stage counts $streamed != batch $batch")
  }
}
