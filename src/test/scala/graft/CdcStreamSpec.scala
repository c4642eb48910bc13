package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** Streaming CDC snapshot: batches compose to the one-shot answer,
  * the protocol makes replays no-ops, AND the max-merge makes even
  * double ingestion algebraically invisible (the HLL-class property —
  * pinned separately, mirroring SketchStreamSpec). */
class CdcStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdcstream")
    d.toFile.deleteOnExit(); d.toString
  }

  private lazy val changes = Tables.load(spark, sf0001, "events")
    .select(col("user_id"), col("event_id").as("version"),
      col("event_type").as("op"), col("value"))

  private def canon(df: DataFrame) =
    df.select("user_id", "version", "op", "value")
      .collect().map(_.toString).sorted.toSeq

  test("batches compose to the one-shot snapshot and match the batch query") {
    val w = work()
    (0 to 2).foreach { i =>
      CdcStream.processBatch(changes.filter(col("version") % 3 === i),
        i.toLong, s"$w/st")
    }
    val snap = CdcStream.snapshot(spark, s"$w/st")
    // one-shot: the same fold applied to the whole log at once
    val oneShot = CdcStream.batchPartial(changes)
      .select(col("user_id"), col("m.version").as("version"),
        col("m.op").as("op"), col("m.value").as("value"))
      .filter(col("op") =!= "error")
    assert(canon(snap) == canon(oneShot))
    // and the declared batch query agrees on the shared columns
    val batchQuery = SparkEntry.queries("cdc_apply")(spark, sf0001)
      .select(col("user_id"), col("last_version").as("version"),
        col("last_op").as("op"), col("value"))
    assert(canon(snap) == canon(batchQuery),
      "stream snapshot != batch cdc_apply")
  }

  test("replay is a no-op and double ingestion is algebraically invisible") {
    val w = work()
    val b0 = changes.filter(col("version") % 2 === 0)
    val b1 = changes.filter(col("version") % 2 === 1)
    CdcStream.processBatch(b0, 0L, s"$w/st")
    CdcStream.processBatch(b1, 1L, s"$w/st")
    val before = canon(CdcStream.snapshot(spark, s"$w/st"))
    // protocol layer: replay of batch 1 overwrites its own partition
    CdcStream.processBatch(b1, 1L, s"$w/st")
    assert(canon(CdcStream.snapshot(spark, s"$w/st")) == before)
    // algebraic layer: the SAME rows ingested under a NEW batch id —
    // the protocol can't dedup this, only idempotent max can
    CdcStream.processBatch(b1, 7L, s"$w/st")
    assert(canon(CdcStream.snapshot(spark, s"$w/st")) == before,
      "double ingestion moved the snapshot")
  }

  test("tombstone drops the key; a later upsert resurrects it") {
    import spark.implicits._
    val w = work()
    val b0 = Seq((1L, 10L, "view", 1.0), (2L, 11L, "view", 2.0))
      .toDF("user_id", "version", "op", "value")
    val b1 = Seq((1L, 20L, "error", 0.0)).toDF("user_id", "version", "op", "value")
    val b2 = Seq((1L, 30L, "purchase", 9.0)).toDF("user_id", "version", "op", "value")
    CdcStream.processBatch(b0, 0L, s"$w/st")
    CdcStream.processBatch(b1, 1L, s"$w/st")
    val afterDelete = CdcStream.snapshot(spark, s"$w/st")
    assert(afterDelete.filter(col("user_id") === 1L).count() == 0)
    assert(afterDelete.count() == 1)
    CdcStream.processBatch(b2, 2L, s"$w/st")
    val resurrected = CdcStream.snapshot(spark, s"$w/st")
      .filter(col("user_id") === 1L).collect()
    assert(resurrected.length == 1 && resurrected.head.getString(2) == "purchase")
  }

  test("sentinel compaction folds partials without moving the snapshot") {
    val w = work()
    (0 to 4).foreach { i =>
      CdcStream.processBatch(changes.filter(col("version") % 5 === i),
        i.toLong, s"$w/st", maxPartials = 2)
    }
    val snap = canon(CdcStream.snapshot(spark, s"$w/st"))
    val oneShot = CdcStream.batchPartial(changes)
      .select(col("user_id"), col("m.version").as("version"),
        col("m.op").as("op"), col("m.value").as("value"))
      .filter(col("op") =!= "error")
    assert(snap == canon(oneShot))
    // the store really did fold: fewer ingest_batch partitions than batches
    val parts = new java.io.File(s"$w/st").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    assert(parts.length < 5, s"no fold happened: ${parts.map(_.getName).toSeq}")
  }
}
