package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Inverted-index retrieval: the oracle already pins index ≡ scan
  * cross-engine; these specs pin the SCALE claims — the probe prunes
  * postings partitions at file listing, and the index answers without
  * touching the corpus. */
class RetrievalSpec extends SparkSpec {

  private def work() = {
    val d = java.nio.file.Files.createTempDirectory("graft_textindex")
    d.toFile.deleteOnExit(); d.toString
  }

  test("index probe equals the corpus-scan query row for row") {
    val dir = s"${work()}/idx"
    Retrieval.writeTextIndex(
      Tables.load(spark, sf0001, "documents"), "doc_id", "text", dir)
    val probe = Retrieval.probeIndexTopK(spark, dir,
      Seq("order", "customer", "scan"), 25)
      .collect().map(_.toString).toSeq
    val scan = SparkEntry.queries("search_bm25_topk")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(probe == scan, "index probe diverged from corpus scan")
  }

  test("probe prunes postings partitions to the query terms' buckets") {
    val dir = s"${work()}/idx"
    Retrieval.writeTextIndex(
      Tables.load(spark, sf0001, "documents"), "doc_id", "text", dir)
    val plan = Retrieval.probeIndexTopK(spark, dir,
      Seq("order", "customer", "scan"), 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*IN[^\\]]*\\].*"),
      s"bucket partition filter missing from probe plan:\n${plan.take(2000)}")
    // and the pruning is real: ≤ 3 of the 16 bucket dirs are listed
    val scanned = plan.linesIterator
      .filter(_.contains("Location: InMemoryFileIndex"))
      .mkString("\n")
    assert(!scanned.contains("16 paths"),
      "postings scan lists every bucket — pruning did not happen")
  }

  test("append ≡ rebuild: incremental index maintenance is exact") {
    val base = s"${work()}/inc"
    val full = s"${work()}/full"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", base)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", base)
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val terms = Seq("order", "customer", "scan")
    val inc = Retrieval.probeIndexTopK(spark, base, terms, 25)
      .collect().map(_.toString).toSeq
    val one = Retrieval.probeIndexTopK(spark, full, terms, 25)
      .collect().map(_.toString).toSeq
    assert(inc == one, "append-maintained index diverged from rebuild")
    // and phrase search agrees too (positions appended intact)
    val pInc = Retrieval.probePhrase(spark, base, "table", "hash")
      .collect().map(_.toString).sorted.toSeq
    val pOne = Retrieval.probePhrase(spark, full, "table", "hash")
      .collect().map(_.toString).sorted.toSeq
    assert(pInc == pOne)
  }

  test("as-of probe reproduces each committed snapshot; folds bound history") {
    val dir = s"${work()}/asof"
    val docs = Tables.load(spark, sf0001, "documents")
    val terms = Seq("order", "customer", "scan")
    def probe() = Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq
    def probeAsOf(g: Long) =
      Retrieval.probeIndexTopKAsOf(spark, dir, g, terms, 25)
        .collect().map(_.toString).toSeq
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir) // gen 0
    val snap0 = probe()
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", dir) // gen 1
    val snap1 = probe()
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", dir) // gen 2
    val head = probe()
    // every past head reproduces exactly — scores included, so the
    // as-of idf/avgdl must come from the snapshot's stats, not today's
    assert(probeAsOf(0) == snap0, "asOf(0) diverged from the gen-0 head")
    assert(probeAsOf(1) == snap1, "asOf(1) diverged from the gen-1 head")
    assert(probeAsOf(2) == head, "asOf(head) diverged from the live probe")
    assert(snap0 != head, "fixture too weak: appends did not change top-k")
    // fold the appends: the base snapshot absorbs gens 0..2, so the
    // head still serves, but pre-fold snapshots are no longer
    // addressable — asking for one throws instead of serving a mixture
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 2))
    assert(probe() == head, "fold changed the served index")
    assert(probeAsOf(-1L) == head,
      "the post-fold base snapshot IS the folded head")
    intercept[IllegalArgumentException](probeAsOf(-2L))
    // new epoch on top of the fold: append ids restart above the
    // committed set; as-of keeps addressing current-epoch snapshots
    Retrieval.appendTextIndex(
      docs.filter(col("doc_id") % 3 === 0).limit(10)
        .withColumn("doc_id", col("doc_id") + 100000L),
      "doc_id", "text", dir) // current-epoch gen 0
    val head2 = probe()
    assert(probeAsOf(-1L) == head, "base snapshot drifted after the append")
    assert(probeAsOf(0L) == head2, "asOf(new head) diverged")
  }

  test("crashed append is invisible; the retry reuses and clears its generation") {
    val base = s"${work()}/inc"
    val docs = Tables.load(spark, sf0001, "documents")
    val terms = Seq("order", "customer", "scan")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", base)
    val before = Retrieval.probeIndexTopK(spark, base, terms, 25)
      .collect().map(_.toString).toSeq
    // simulate the crash window: a WRONG delta's postings land at the
    // next generation id, but the run dies before the stats marker
    val (_, orphan) = Retrieval.stagePostings(
      docs.filter(col("doc_id") % 4 === 1), "doc_id", "text")
    orphan.withColumn("ingest_batch", lit(1L))
      .write.mode("append").partitionBy("ingest_batch", "bucket")
      .parquet(s"$base/postings")
    val crashed = Retrieval.probeIndexTopK(spark, base, terms, 25)
      .collect().map(_.toString).toSeq
    assert(crashed == before,
      "probe scored postings of an append with no commit marker")
    // the retry (with the REAL delta) must reuse generation 1 and
    // clear the orphan — not strand it or double-append
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", base)
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val inc = Retrieval.probeIndexTopK(spark, base, terms, 25)
      .collect().map(_.toString).toSeq
    val one = Retrieval.probeIndexTopK(spark, full, terms, 25)
      .collect().map(_.toString).toSeq
    assert(inc == one, "retried append diverged from rebuild")
  }

  test("compaction folds generations, keeps probes exact, and appends resume") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    val terms = Seq("order", "customer", "scan")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", dir)
    // crash window of a fold: the sentinel's postings land but the
    // stats swap (the commit point) never happens — the index must
    // keep serving the source generations exactly
    val preFold = Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq
    val (_, orphanFold) = Retrieval.stagePostings(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    orphanFold.withColumn("ingest_batch", lit(-1L))
      .write.mode("append").partitionBy("ingest_batch", "bucket")
      .parquet(s"$dir/postings")
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq == preFold,
      "an uncommitted fold sentinel leaked into the probe")
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 1),
      "compaction should trigger above maxPartials generations")
    assert(spark.read.parquet(s"$dir/stats")
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet == Set(-1L),
      "compaction should leave only the fold sentinel")
    // ...and the GC step dropped every unmarked postings partition
    // (the folded sources AND the crashed fold's half-written
    // sentinel, which the real fold recomputed in place)
    val leftDirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(leftDirs == Set("ingest_batch=-1"),
      s"unmarked postings partitions survived GC: $leftDirs")
    // probe across the sentinel equals a rebuild of the same corpus...
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 3 < 2),
      "doc_id", "text", full)
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, full, terms, 25)
        .collect().map(_.toString).toSeq)
    // ...and maintenance continues on the compacted index
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", dir)
    val all = s"${work()}/all"
    Retrieval.writeTextIndex(docs, "doc_id", "text", all)
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, all, terms, 25)
        .collect().map(_.toString).toSeq,
      "append after compaction diverged from rebuild")
    assert(Retrieval.probePhrase(spark, dir, "table", "hash")
      .collect().map(_.toString).sorted.toSeq ==
      Retrieval.probePhrase(spark, all, "table", "hash")
        .collect().map(_.toString).sorted.toSeq)
  }

  test("major fold collapses sentinel runs; minor folds never touch them") {
    val dir = s"${work()}/lsm"
    val docs = Tables.load(spark, sf0001, "documents")
    val terms = Seq("order", "customer", "scan")
    def part(i: Int) = docs.filter(col("doc_id") % 6 === i)
    Retrieval.writeTextIndex(part(0), "doc_id", "text", dir)
    Retrieval.appendTextIndex(part(1), "doc_id", "text", dir)
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 1))
    def gens = spark.read.parquet(s"$dir/stats")
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(gens == Set(-1L))
    Retrieval.appendTextIndex(part(2), "doc_id", "text", dir)
    Retrieval.appendTextIndex(part(3), "doc_id", "text", dir)
    // minor fold: batch gens collapse into a SECOND run, -1 untouched
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 1))
    assert(gens == Set(-1L, -2L), s"minor fold rewrote sentinels: $gens")
    Retrieval.appendTextIndex(part(4), "doc_id", "text", dir)
    Retrieval.appendTextIndex(part(5), "doc_id", "text", dir)
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 1))
    assert(gens == Set(-1L, -2L, -3L))
    // major fold: sentinel count reaches the threshold, runs collapse
    assert(Retrieval.compactTextIndex(spark, dir, maxPartials = 1,
      maxSentinels = 3))
    assert(gens == Set(-4L), s"major fold left runs behind: $gens")
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, full, terms, 25)
        .collect().map(_.toString).toSeq,
      "LSM-folded index diverged from rebuild")
  }

  test("append onto an empty-corpus base neither NPEs nor skews stats") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") < 0),
      "doc_id", "text", dir) // empty base: n_docs=0, sum_dl must be 0
    Retrieval.appendTextIndex(docs, "doc_id", "text", dir)
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val terms = Seq("order", "customer", "scan")
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, full, terms, 25)
        .collect().map(_.toString).toSeq,
      "empty-base append diverged from rebuild")
  }

  test("rebuild-in-place over a serving index is crash-safe and exact") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    val terms = Seq("order", "customer", "scan")
    val preBuild = Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq
    // crash between the rebuild's two writes: the rebuilt corpus has
    // landed as its (unmarked) generation, the stats swap never ran —
    // probes must keep serving the exact pre-build index
    val (_, postings) = Retrieval.stagePostings(docs, "doc_id", "text")
    postings.withColumn("ingest_batch", lit(1L))
      .write.mode("append").partitionBy("ingest_batch", "bucket")
      .parquet(s"$dir/postings")
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq == preBuild,
      "probe scored an uncommitted rebuild")
    // the retried rebuild reuses and clears the orphan, commits via
    // the stats swap, and GCs the old generations
    Retrieval.writeTextIndex(docs, "doc_id", "text", dir)
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, full, terms, 25)
        .collect().map(_.toString).toSeq,
      "rebuild-in-place diverged from a fresh build")
    val gens = spark.read.parquet(s"$dir/stats")
      .select(col("ingest_batch").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(gens == Set(1L), s"stats generations $gens")
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      .map(_.getName).toSet
    assert(dirs == Set("ingest_batch=1"), s"postings dirs not GC'd: $dirs")
  }

  test("a rebuild clears a stale stream-base marker") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    graft.streaming.IndexStream.processBatch(
      docs.filter(col("doc_id") % 2 === 1), 0L, dir)
    assert(FsUtils.readString(spark, s"$dir/_stream_base").isDefined)
    // the rebuild starts a new generation history — a re-attached
    // stream must derive a fresh base, not reuse the old band
    Retrieval.writeTextIndex(docs, "doc_id", "text", dir)
    assert(FsUtils.readString(spark, s"$dir/_stream_base").isEmpty,
      "stale stream base survived the rebuild")
  }

  test("orphan postings are swept by any compaction call, not only a fold") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", dir)
    // a crashed fold that swapped stats but died before its GC leaves
    // unmarked source partitions; fake one
    val (_, postings) = Retrieval.stagePostings(docs, "doc_id", "text")
    postings.withColumn("ingest_batch", lit(7L))
      .write.mode("append").partitionBy("ingest_batch", "bucket")
      .parquet(s"$dir/postings")
    // two live generations — far below maxPartials, so no fold runs,
    // but the sweep must still reclaim the orphan
    assert(!Retrieval.compactTextIndex(spark, dir))
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      .map(_.getName).toSet
    assert(!dirs.contains("ingest_batch=7"), s"orphan not swept: $dirs")
    // and the index still probes exactly
    val full = s"${work()}/full"
    Retrieval.writeTextIndex(docs, "doc_id", "text", full)
    val terms = Seq("order", "customer", "scan")
    assert(Retrieval.probeIndexTopK(spark, dir, terms, 25)
      .collect().map(_.toString).toSeq ==
      Retrieval.probeIndexTopK(spark, full, terms, 25)
        .collect().map(_.toString).toSeq)
  }

  test("phrase search matches a direct token-stream recount") {
    val dir = s"${work()}/idx"
    val docs = Tables.load(spark, sf0001, "documents")
    Retrieval.writeTextIndex(docs, "doc_id", "text", dir)
    val got = Retrieval.probePhrase(spark, dir, "table", "hash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recount from the raw token stream
    val tk = filter(split(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", " "), "\\s+"), v => length(v) > 0)
    val expect = docs.select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), col("tk"), explode(
        when(size(col("tk")) < 2, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("tk")) - 1))).as("i"))
      .filter(element_at(col("tk"), col("i")) === "table" &&
        element_at(col("tk"), col("i") + 1) === "hash")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
