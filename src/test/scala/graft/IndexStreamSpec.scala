package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval
import graft.streaming.IndexStream

/** Streaming inverted-index maintenance: probe-after-batches equals a
  * batch-built index of the union corpus (and therefore the corpus
  * scan), replays rewrite only their own partitions, and phrase search
  * works over the streamed layout unchanged. */
class IndexStreamSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_indexstream")
    d.toFile.deleteOnExit(); d.toString
  }

  private lazy val docs = Tables.load(spark, sf0001, "documents")
  private def third(i: Int) = docs.filter(col("doc_id") % 3 === i)
  private val terms = Seq("order", "customer", "scan")

  test("stream ≡ batch index ≡ corpus scan") {
    val w = work()
    (0 to 2).foreach(i =>
      IndexStream.processBatch(third(i), i.toLong, s"$w/idx"))
    val streamed = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    val full = s"$w/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val batch = Retrieval.probeIndexTopK(spark, full, terms, 25)
      .collect().map(_.toString).toSeq
    assert(streamed == batch, "streamed index diverged from batch build")
    val scan = SparkEntry.queries("search_bm25_topk")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(streamed == scan, "streamed index diverged from corpus scan")
  }

  test("replay rewrites only its own partitions; empty batch is a no-op") {
    val w = work()
    IndexStream.processBatch(third(0), 0L, s"$w/idx")
    IndexStream.processBatch(third(1), 1L, s"$w/idx")
    val before = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    IndexStream.processBatch(third(1), 1L, s"$w/idx") // replay
    IndexStream.processBatch(docs.filter(col("doc_id") < 0), 2L, s"$w/idx")
    val after = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    assert(after == before)
    // no stats partial for the empty batch
    assert(!new java.io.File(s"$w/idx/stats/ingest_batch=2").exists())
  }

  test("uncommitted postings (no stats marker) are invisible to the probe") {
    val w = work()
    IndexStream.processBatch(third(0), 0L, s"$w/idx")
    val before = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    // simulate a crash between the postings write and the stats
    // commit marker: land batch 9's postings by hand, no stats row
    val (_, postings) = Retrieval.stagePostings(third(1), "doc_id", "text")
    postings.withColumn("ingest_batch", lit(9L))
      .write.mode("append").partitionBy("ingest_batch", "bucket")
      .parquet(s"$w/idx/postings")
    val after = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    assert(after == before,
      "probe scored postings of a batch with no commit marker")
  }

  test("phrase search runs unchanged over the streamed layout") {
    val w = work()
    (0 to 2).foreach(i =>
      IndexStream.processBatch(third(i), i.toLong, s"$w/idx"))
    val full = s"$w/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val streamed = Retrieval.probePhrase(spark, s"$w/idx", "table", "hash")
      .collect().map(_.toString).sorted.toSeq
    val batch = Retrieval.probePhrase(spark, full, "table", "hash")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("pre-first-commit probes answer empty, not PATH_NOT_FOUND") {
    val w = s"${work()}/never_written"
    assert(IndexStream.probeTopK(spark, w, terms, 25).collect().isEmpty)
    assert(Retrieval.probePhrase(spark, w, "table", "hash")
      .collect().isEmpty)
  }

  test("compaction keeps the store bounded and the probe exact") {
    val w = work()
    (0 to 4).foreach(i =>
      IndexStream.processBatch(docs.filter(col("doc_id") % 5 === i),
        i.toLong, s"$w/idx", maxPartials = 2))
    // generations fold as batches accumulate: never more than
    // maxPartials + 1 (sentinel + protected current + headroom) live
    val gens = spark.read.parquet(s"$w/idx/stats")
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(gens.size <= 3 && gens.contains(-1L),
      s"store not compacted: generations $gens")
    val streamed = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    val full = s"$w/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    assert(streamed == Retrieval.probeIndexTopK(spark, full, terms, 25)
      .collect().map(_.toString).toSeq,
      "compacted streamed index diverged from batch build")
  }

  test("a crashed compaction swap heals at the next batch") {
    val w = work()
    (0 to 2).foreach(i =>
      IndexStream.processBatch(third(i), i.toLong, s"$w/idx"))
    val before = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    // simulate a crash between the two renames: the live postings dir
    // is displaced to the .old side dir and never promoted back
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$w/idx/postings"),
      new org.apache.hadoop.fs.Path(s"$w/idx/postings.old")))
    IndexStream.processBatch(docs.filter(col("doc_id") < 0), 3L, s"$w/idx")
    val after = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    assert(after == before, "recovery did not restore the displaced store")
  }

  test("a stream attached to a seeded index never overwrites committed " +
      "generations") {
    val w = work()
    val idx = s"$w/idx"
    def fifth(i: Int) = docs.filter(col("doc_id") % 5 === i)
    Retrieval.writeTextIndex(fifth(0), "doc_id", "text", idx) // gen 0
    Retrieval.appendTextIndex(fifth(1), "doc_id", "text", idx) // gen 1
    // batch ids 0..2 must land at generations 2..4 (stream base above
    // the committed set), never at 0/1 where they would clear-and-
    // overwrite the seed and the append
    (0 to 2).foreach(i =>
      IndexStream.processBatch(fifth(i + 2), i.toLong, idx))
    val gens = spark.read.parquet(s"$idx/stats")
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(gens == Set(0L, 1L, 2L, 3L, 4L), s"generations $gens")
    val streamed = IndexStream.probeTopK(spark, idx, terms, 25)
      .collect().map(_.toString).toSeq
    val full = s"$w/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    assert(streamed == Retrieval.probeIndexTopK(spark, full, terms, 25)
      .collect().map(_.toString).toSeq,
      "stream over a seeded index dropped the pre-stream corpus")
    // the persisted base keeps replays deterministic: a replayed batch
    // still rewrites exactly its own generation
    IndexStream.processBatch(fifth(3), 1L, idx)
    assert(IndexStream.probeTopK(spark, idx, terms, 25)
      .collect().map(_.toString).toSeq == streamed,
      "replay on a seeded index changed the probe")
  }

  test("file-stream end to end via run()") {
    val w = work()
    val inDir = s"$w/in"
    new java.io.File(inDir).mkdirs()
    (0 to 1).foreach { i =>
      docs.filter(col("doc_id") % 2 === i).coalesce(1)
        .write.parquet(s"$w/b$i")
      val src = new java.io.File(s"$w/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$inDir/batch_$i.parquet").toPath)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = IndexStream.run(stream, s"$w/idx", s"$w/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = IndexStream.probeTopK(spark, s"$w/idx", terms, 25)
      .collect().map(_.toString).toSeq
    val scan = SparkEntry.queries("search_bm25_topk")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(streamed == scan)
  }
}
