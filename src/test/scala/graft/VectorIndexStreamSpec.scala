package graft

import org.apache.spark.sql.functions._
import graft.operators.{GenStore, Similarity}
import graft.streaming.VectorIndexStream

/** Streaming IVF maintenance: micro-batches under the GenStore marker
  * protocol probe identically to a one-shot build, replays rewrite
  * only their own generation, compaction keeps the store bounded, and
  * the persisted stream base keeps batch ids clear of pre-stream
  * generations. */
class VectorIndexStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_vecstream")
    d.toFile.deleteOnExit(); d.toString
  }

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  /** Seed idxB with wave-0 vectors UNDER idxA's centroids, so the
    * streamed and one-shot indexes score in the same bucket space. */
  private def seed(idxA: String, idxB: String, upTo: Int): Unit = {
    import spark.implicits._
    spark.read.parquet(Similarity.centroidsPathOf(idxA))
      .write.mode("overwrite").parquet(Similarity.centroidsPathOf(idxB))
    GenStore.ingest(spark, idxB, Similarity.gensPathOf(idxB), 0L,
      Similarity.assignBuckets(
        emb.filter(col("vec_id") < upTo)
          .select(col("vec_id").as("cid"), col("embedding").as("ce")),
        "cid", "ce", spark.read.parquet(Similarity.centroidsPathOf(idxA))),
      Seq("bucket"), Seq((upTo.toLong, 0L)).toDF("n_vecs", "ingest_batch"))
  }

  test("stream ≡ one-shot; replay no-op; compaction bounds generations") {
    val w = work()
    val idxA = s"$w/idxA"
    val idxB = s"$w/idxB"
    Similarity.writeIvfIndex(spark, sf0001, idxA)
    seed(idxA, idxB, 200)
    def wave(lo: Int, hi: Int) =
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
    VectorIndexStream.processBatch(wave(200, 350), 0L, idxB,
      maxPartials = 2)
    VectorIndexStream.processBatch(wave(350, 500), 1L, idxB,
      maxPartials = 2)
    def probe(p: String) = VectorIndexStream.probeTopK(spark, sf0001, p)
      .collect().map(_.toString).toSet
    val oneShot = probe(idxA)
    assert(probe(idxB) == oneShot,
      "streamed index diverged from one-shot build")
    // the stream base cleared the seed generation: batch 0 did NOT
    // overwrite generation 0
    val base = graft.FsUtils.readString(spark, s"${idxB}_stream_base")
      .get.trim.toLong
    assert(base >= 1L, s"stream base $base collides with the seed")
    // at-least-once replay of the latest batch rewrites only itself
    VectorIndexStream.processBatch(wave(350, 500), 1L, idxB,
      maxPartials = 2)
    assert(probe(idxB) == oneShot, "replay changed the probe")
    // compaction ran under maxPartials=2: bounded generation count
    val gens = spark.read.parquet(Similarity.gensPathOf(idxB))
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(gens.size <= 3, s"generations not bounded: $gens")
  }

  test("a centroids-only index fails with the rebuild instruction, " +
      "not a raw path error") {
    val w = work()
    val idx = s"$w/ivf"
    Similarity.writeIvfIndex(spark, sf0001, idx)
    // simulate a seed build that died before its generation marker
    // (or a hand-copied centroid sidecar): centroids exist, gens don't
    val gens = new org.apache.hadoop.fs.Path(Similarity.gensPathOf(idx))
    gens.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(gens, true)
    val e = intercept[IllegalArgumentException] {
      VectorIndexStream.processBatch(
        emb.filter(col("vec_id") < 50), 0L, idx)
    }
    assert(e.getMessage.contains("rebuild with writeIvfIndex"),
      s"wrong failure: ${e.getMessage}")
  }

  test("file-stream end to end via run()") {
    val w = work()
    val idxA = s"$w/idxA"
    val idxB = s"$w/idxB"
    Similarity.writeIvfIndex(spark, sf0001, idxA)
    seed(idxA, idxB, 250)
    val inDir = s"$w/in"
    new java.io.File(inDir).mkdirs()
    Seq((250, 375), (375, 500)).zipWithIndex.foreach { case ((lo, hi), i) =>
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.parquet(s"$w/b$i")
      val src = new java.io.File(s"$w/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$inDir/batch_$i.parquet").toPath)
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = VectorIndexStream.run(stream, idxB, s"$w/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(VectorIndexStream.probeTopK(spark, sf0001, idxB)
      .collect().map(_.toString).toSet ==
      VectorIndexStream.probeTopK(spark, sf0001, idxA)
        .collect().map(_.toString).toSet,
      "file-streamed index diverged from one-shot build")
  }
}
