package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.streaming.SketchStream

/** The streaming register fold: batches compose to the one-shot
  * sketch, replay and double-ingest cannot move an estimate, and the
  * partial fold is content-neutral. */
class SketchStreamSpec extends SparkSpec {

  private val keys = Seq("event_type")

  private def events = Tables.load(spark, sf0001, "events")
    .select(col("event_type"), col("user_id"))

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def work(): String =
    java.nio.file.Files.createTempDirectory("graft_sketchstream").toString

  test("batches compose: streamed register store equals one-shot registers") {
    val store = work() + "/regs"
    val slices = (0 to 2).map(i => events.filter(abs(hash(col("user_id"))) % 3 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      SketchStream.processBatch(b, i.toLong, keys, "user_id", store)
    }
    val oneShot = Sketches.hllRegisters(events, keys, "user_id")
    assert(canon(SketchStream.readRegisters(spark, store, keys)) ==
      canon(oneShot), "streamed store != one-shot registers")
    assert(canon(SketchStream.estimate(spark, store, keys)) ==
      canon(Sketches.hllEstimate(oneShot, keys)))
  }

  test("replay of a batch is a no-op; double-ingest under a new id too") {
    val store = work() + "/regs"
    val slices = (0 to 1).map(i => events.filter(abs(hash(col("user_id"))) % 2 === i))
    SketchStream.processBatch(slices(0), 0L, keys, "user_id", store)
    SketchStream.processBatch(slices(1), 1L, keys, "user_id", store)
    val before = canon(SketchStream.readRegisters(spark, store, keys))
    // at-least-once replay: same batch id, same data — dynamic
    // overwrite rewrites exactly its own partition
    SketchStream.processBatch(slices(1), 1L, keys, "user_id", store)
    assert(canon(SketchStream.readRegisters(spark, store, keys)) == before,
      "replay changed the store")
    // log duplication: the same rows land AGAIN under a fresh batch id
    // — protocol can't dedup this, but max-merge absorbs it
    SketchStream.processBatch(slices(0), 7L, keys, "user_id", store)
    assert(canon(SketchStream.readRegisters(spark, store, keys)) == before,
      "double-ingest moved a register")
  }

  test("partial fold collapses partitions without changing registers") {
    val store = work() + "/regs"
    val slices = (0 to 3).map(i => events.filter(abs(hash(col("user_id"))) % 4 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      SketchStream.processBatch(b, i.toLong, keys, "user_id", store,
        maxPartials = 2)
    }
    val parts = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      .map(_.getName).toSet
    assert(parts.contains("ingest_batch=-1"), s"no folded sentinel in $parts")
    assert(parts.size <= 3, s"fold left too many partials: $parts")
    assert(canon(SketchStream.readRegisters(spark, store, keys)) ==
      canon(Sketches.hllRegisters(events, keys, "user_id")),
      "fold changed register content")
  }

  test("CMS stream: batches compose, replay no-op via protocol, fold neutral") {
    val store = work() + "/cms"
    val items = Tables.load(spark, sf0001, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val slices = (0 to 3).map(i => items.filter(abs(hash(col("token"))) % 4 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.SketchStream.processCmsBatch(b, i.toLong, "token",
        store, maxPartials = 2)
    }
    val oneShot = operators.Sketches.cmsCounters(
      items.groupBy("token").agg(count(lit(1)).as("cnt")), "token", "cnt")
    assert(canon(graft.streaming.SketchStream.readCounters(spark, store)) ==
      canon(oneShot), "streamed counters != one-shot")
    // SUM merge is NOT double-ingest idempotent — replay safety is the
    // partition-overwrite protocol: same batch id, same data, no drift
    val before = canon(graft.streaming.SketchStream.readCounters(spark, store))
    graft.streaming.SketchStream.processCmsBatch(slices(3), 3L, "token",
      store, maxPartials = 2)
    assert(canon(graft.streaming.SketchStream.readCounters(spark, store)) ==
      before, "replay changed the counters")
  }

  test("KMV stream: batches compose, double-ingest idempotent, fold neutral") {
    val store = work() + "/kmv"
    val ev = events
    val slices = (0 to 3).map(i => ev.filter(abs(hash(col("user_id"))) % 4 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.SketchStream.processKmvBatch(b, i.toLong,
        keys, "user_id", store, maxPartials = 2)
    }
    val oneShot = operators.Sketches.kmvSketch(ev, keys, "user_id")
    assert(canon(graft.streaming.SketchStream.readKmv(spark, store, keys)) ==
      canon(oneShot), "streamed bottom-k != one-shot sketch")
    // min-selection is algebraically idempotent: the same rows under a
    // NEW batch id cannot move the sketch (the HLL-class guarantee)
    val before = canon(graft.streaming.SketchStream.readKmv(spark, store, keys))
    graft.streaming.SketchStream.processKmvBatch(slices(0), 9L,
      keys, "user_id", store, maxPartials = 2)
    assert(canon(graft.streaming.SketchStream.readKmv(spark, store, keys)) ==
      before, "double-ingest moved a bottom-k hash")
    assert(canon(graft.streaming.SketchStream.kmvEstimate(spark, store, keys)) ==
      canon(operators.Sketches.kmvEstimate(oneShot, keys)))
  }

  test("histogram stream: batches compose and serve quantiles") {
    val store = work() + "/hist"
    val li = Tables.load(spark, sf0001, "lineitem")
    val slices = (0 to 2).map(i => li.filter(abs(hash(col("l_orderkey"))) % 3 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.SketchStream.processHistBatch(b, i.toLong,
        Seq("l_returnflag"), "l_extendedprice", store)
    }
    val oneShot = operators.Sketches.histBuckets(li, Seq("l_returnflag"),
      "l_extendedprice")
    assert(canon(graft.streaming.SketchStream.readHist(spark, store,
      Seq("l_returnflag"))) == canon(oneShot))
    assert(canon(graft.streaming.SketchStream.histEstimate(spark, store,
      Seq("l_returnflag"))) ==
      canon(operators.Sketches.histQuantiles(oneShot, Seq("l_returnflag"))))
  }

  test("streamed hist store serves the sketch-tier anomaly monitor's scalars") {
    // the round-9 tie-in: events_anomaly_hdr's median estimate comes
    // from the SAME bucket geometry the streaming store folds, so a
    // continuously-ingested histogram can serve the monitor's med̂
    // without any batch recompute — prove the streamed store's pick
    // equals the batch pick over the union corpus
    val store = work() + "/ev_hist"
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("value"))
    (0 to 2).foreach { i =>
      graft.streaming.SketchStream.processHistBatch(
        ev.filter(abs(hash(col("value"))) % 3 === i), i.toLong,
        Seq("event_type"), "value", store)
    }
    val streamedMed = canon(operators.Sketches.histQuantilesAt(
      graft.streaming.SketchStream.readHist(spark, store, Seq("event_type")),
      Seq("event_type"), Seq(0.5 -> "med")))
    val batchMed = canon(operators.Sketches.histQuantilesAt(
      operators.Sketches.histBuckets(ev, Seq("event_type"), "value"),
      Seq("event_type"), Seq(0.5 -> "med")))
    assert(streamedMed == batchMed,
      "streamed hist store diverged from the batch monitor's median")
  }

  test("file-stream end to end: run() folds each micro-batch") {
    val w = work()
    val inDir = s"$w/in"
    new java.io.File(inDir).mkdirs()
    (0 to 2).foreach { i =>
      events.filter(abs(hash(col("user_id"))) % 3 === i)
        .coalesce(1).write.parquet(s"$w/b$i")
      val src = new java.io.File(s"$w/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$inDir/batch_$i.parquet").toPath)
    }
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = SketchStream.run(stream, keys, "user_id", s"$w/regs",
      s"$w/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(canon(SketchStream.estimate(spark, s"$w/regs", keys)) ==
      canon(Sketches.hllEstimate(
        Sketches.hllRegisters(events, keys, "user_id"), keys)),
      "streamed estimate != one-shot estimate")
  }
}
