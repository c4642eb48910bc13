package graft

import org.apache.spark.sql.functions._
import graft.operators.Training
import graft.streaming.TrainStream

/** Streaming mini-batch SGD: the store walks exactly the sequential
  * gdStep trajectory, replays cannot double-step, and the file-stream
  * wiring reproduces the direct-call result. */
class TrainStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_trainstream")
    d.toFile.deleteOnExit(); d.toString
  }

  private lazy val docs = Tables.load(spark, sf0001, "documents")
  private def half(i: Int) = docs.filter(col("doc_id") % 2 === i)

  test("two micro-batches equal the sequential two-step trajectory") {
    val w = work()
    TrainStream.processBatch(half(0), 0L, s"$w/st")
    TrainStream.processBatch(half(1), 1L, s"$w/st")
    val streamed = TrainStream.currentWeights(spark, s"$w/st")

    val (w1, _, _) = Training.gdStep(
      Training.featuresOf(half(0)), Array.fill(4)(0.0))
    val (w2, _, _) = Training.gdStep(Training.featuresOf(half(1)), w1)
    assert(streamed.toSeq == w2.toSeq,
      s"streamed ${streamed.toSeq} != sequential ${w2.toSeq}")
    // the curve reads back in batch order with both states
    val curve = TrainStream.lossCurve(spark, s"$w/st").collect()
    assert(curve.map(_.getLong(0)).toSeq == Seq(0L, 1L))
  }

  test("replaying a batch is a no-op: entering state is strictly prior") {
    val w = work()
    TrainStream.processBatch(half(0), 0L, s"$w/st")
    TrainStream.processBatch(half(1), 1L, s"$w/st")
    val before = TrainStream.currentWeights(spark, s"$w/st").toSeq
    // at-least-once delivery: batch 1 fires again (crash between the
    // state write and the checkpoint commit)
    TrainStream.processBatch(half(1), 1L, s"$w/st")
    val after = TrainStream.currentWeights(spark, s"$w/st").toSeq
    assert(after == before, "replay moved the weights")
    assert(TrainStream.lossCurve(spark, s"$w/st").count() == 2)
  }

  test("empty micro-batch is a no-op, not a crash or a curve entry") {
    val w = work()
    TrainStream.processBatch(half(0), 0L, s"$w/st")
    val before = TrainStream.currentWeights(spark, s"$w/st").toSeq
    TrainStream.processBatch(docs.filter(col("doc_id") < 0), 1L, s"$w/st")
    assert(TrainStream.currentWeights(spark, s"$w/st").toSeq == before)
    assert(TrainStream.lossCurve(spark, s"$w/st").count() == 1,
      "empty batch must not write a state row")
  }

  test("file-stream end to end: run() matches direct processBatch calls") {
    val w = work()
    val inDir = s"$w/in"
    new java.io.File(inDir).mkdirs()
    (0 to 1).foreach { i =>
      half(i).coalesce(1).write.parquet(s"$w/b$i")
      val src = new java.io.File(s"$w/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$inDir/batch_$i.parquet").toPath)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = TrainStream.run(stream, s"$w/st", s"$w/ckpt")
    try q.processAllAvailable() finally q.stop()

    val ref = work()
    TrainStream.processBatch(half(0), 0L, s"$ref/st")
    TrainStream.processBatch(half(1), 1L, s"$ref/st")
    assert(TrainStream.currentWeights(spark, s"$w/st").toSeq ==
      TrainStream.currentWeights(spark, s"$ref/st").toSeq)
  }
}
