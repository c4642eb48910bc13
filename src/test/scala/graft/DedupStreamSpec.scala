package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.DedupStream

/** Streaming incremental dedup: batch-by-batch processing must land on
  * the same candidate-pair set as one full-corpus run, survive batch
  * replay unchanged (the foreachBatch at-least-once contract), and
  * absorb re-deliveries. */
class DedupStreamSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "text")

  test("micro-batched pairs == full-corpus pairs; replay is a no-op") {
    val work = Files.createTempDirectory("graft_dstream").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    // batch 0: the base corpus; batch 1: injected copies of 0-19 plus a
    // RE-DELIVERY of docs 0-4 (at-least-once ingest)
    val b0 = docs
    val copies = docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") < 10, col("text"))
        .otherwise(concat(col("text"), lit(" extra suffix tokens")))
        .as("text"))
    val b1 = copies.unionByName(docs.filter(col("doc_id") < 5))

    DedupStream.processBatch(b0, 0L, "doc_id", "text", store, pairs)
    DedupStream.processBatch(b1, 1L, "doc_id", "text", store, pairs)

    def pairSet = spark.read.parquet(pairs)
      .select("doc_a", "doc_b", "n_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = pairSet

    // one-shot reference: all docs at once
    val full = Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesFor(b0.unionByName(copies), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == full,
      s"streamed ${streamed.size} pairs vs full ${full.size}")
    assert(streamed.nonEmpty)

    // store holds every doc exactly once despite the re-delivery
    val storeIds = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0))
    assert(storeIds.length == storeIds.distinct.length)
    assert(storeIds.length == b0.count() + copies.count())

    // replay batch 1 (checkpoint commit lost): identical end state
    DedupStream.processBatch(b1, 1L, "doc_id", "text", store, pairs)
    assert(pairSet == streamed)
    assert(spark.read.parquet(store).count() == storeIds.length)
  }

  test("banded batch persists hot-bucket-cap stats beside the pairs sink") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_dcap").toString
    val (store, bandsP, countsP, pairs) =
      (s"$work/store", s"$work/bands", s"$work/counts", s"$work/pairs")
    // 70 byte-identical docs → each of the 4 bands is one 70-member
    // bucket, over the 64 cap: the batch probes nothing and must SAY so
    val clones = (0 until 70).map(i =>
      (i.toLong, "identical clone text tripping the hot bucket cap"))
      .toDF("doc_id", "text")
    DedupStream.processBatchBanded(clones, 0L, "doc_id", "text",
      store, bandsP, countsP, pairs)
    val statsPath = DedupStream.capStatsPathOf(pairs)
    val r0 = spark.read.parquet(statsPath)
      .filter(col("ingest_batch") === 0L).collect().head
    assert(r0.getAs[Long]("dropped_buckets") == 4, r0.toString)
    assert(r0.getAs[Long]("dropped_band_rows") == 4L * 70, r0.toString)
    // healthy follow-up batch: a zero-drop record under its own partition
    val ok = Seq((200L, "some wholly different words here"),
      (201L, "other unrelated vocabulary there")).toDF("doc_id", "text")
    DedupStream.processBatchBanded(ok, 1L, "doc_id", "text",
      store, bandsP, countsP, pairs)
    val r1 = spark.read.parquet(statsPath)
      .filter(col("ingest_batch") === 1L).collect().head
    assert(r1.getAs[Long]("dropped_buckets") == 0)
    assert(r1.getAs[Long]("dropped_band_rows") == 0)
    // replaying the degenerate batch overwrites its stats, not appends
    DedupStream.processBatchBanded(clones, 0L, "doc_id", "text",
      store, bandsP, countsP, pairs)
    assert(spark.read.parquet(statsPath)
      .filter(col("ingest_batch") === 0L).count() == 1)
  }

  test("autocompaction keeps N micro-appends under the file bound") {
    val work = Files.createTempDirectory("graft_dcompact").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    def storeFiles = new java.io.File(store).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    val maxFiles = 8
    // 10 disjoint 40-doc batches; each append adds a file per shuffle
    // partition, so without compaction the store blows past the bound
    (0 until 10).foreach { b =>
      val batch = docs.filter(col("doc_id") % 10 === b).limit(40)
      DedupStream.processBatch(batch, b.toLong, "doc_id", "text",
        store, pairs, maxStoreFiles = maxFiles)
    }
    // bound honored: after any batch that tripped the compactor the
    // store is rewritten to ~one file, so growth restarts from there —
    // the count can never exceed bound + one batch's worth of appends
    assert(storeFiles <= maxFiles + spark.conf
      .get("spark.sql.shuffle.partitions").toInt,
      s"store holds $storeFiles files, bound was $maxFiles")
    // and at least one compaction actually ran (growth was reset);
    // content is intact: one signature row per distinct ingested doc
    val ids = spark.read.parquet(store).select("doc_id").collect()
      .map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    assert(storeFiles < 10 * 2, "no compaction ever ran")
    // a crash mid-swap is healed on the next batch: simulate the gap
    // (store renamed away, committed fresh copy left beside it)
    val fs = new java.io.File(store)
    val tmp = new java.io.File(store + ".compacting")
    assert(fs.renameTo(tmp))
    DedupStream.recoverCompaction(spark, store)
    assert(fs.exists && !tmp.exists)
    assert(spark.read.parquet(store).select("doc_id").count() == ids.length)
  }

  test("banded store path: pairs == recompute path == full run; replay no-op") {
    val work = Files.createTempDirectory("graft_banded").toString
    val store = s"$work/sig_store"
    val bands = s"$work/band_store"
    val counts = s"$work/count_store"
    val pairs = s"$work/pairs"
    val b0 = docs
    val copies = docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") < 10, col("text"))
        .otherwise(concat(col("text"), lit(" extra suffix tokens")))
        .as("text"))
    val b1 = copies.unionByName(docs.filter(col("doc_id") < 5))

    DedupStream.processBatchBanded(b0, 0L, "doc_id", "text",
      store, bands, counts, pairs)
    DedupStream.processBatchBanded(b1, 1L, "doc_id", "text",
      store, bands, counts, pairs)

    def pairSet = spark.read.parquet(pairs)
      .select("doc_a", "doc_b", "n_bands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = pairSet
    val full = Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesFor(b0.unionByName(copies), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == full,
      s"banded ${streamed.size} pairs vs full ${full.size}")
    assert(streamed.nonEmpty)

    // store invariants: 4 band rows per signature; count partials sum
    // to the true bucket sizes (the cap decisions depend on this)
    val nSigs = spark.read.parquet(store).count()
    assert(spark.read.parquet(bands).count() == 4 * nSigs)
    val fromPartials = spark.read.parquet(counts)
      .groupBy("band_idx", "band_hash").agg(sum("n").as("n"))
    val fromBands = spark.read.parquet(bands)
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
    assert(fromPartials.exceptAll(fromBands).isEmpty &&
      fromBands.exceptAll(fromPartials).isEmpty)

    // replay batch 1: every store and the pairs sink end identical
    DedupStream.processBatchBanded(b1, 1L, "doc_id", "text",
      store, bands, counts, pairs)
    assert(pairSet == streamed)
    assert(spark.read.parquet(store).count() == nSigs)
    assert(spark.read.parquet(bands).count() == 4 * nSigs)
  }

  test("counts fold collapses partials without changing later batches") {
    val work = Files.createTempDirectory("graft_fold").toString
    def drive(sub: String, foldAfter: Int): Set[(Long, Long, Int)] = {
      val (store, bands, counts, pairs) = (s"$work/$sub/sig",
        s"$work/$sub/bands", s"$work/$sub/counts", s"$work/$sub/pairs")
      // 5 disjoint slices, then the injected copies — pairs emit last
      (0 until 5).foreach { b =>
        DedupStream.processBatchBanded(
          docs.filter(col("doc_id") % 5 === b), b.toLong, "doc_id", "text",
          store, bands, counts, pairs, foldAfter = foldAfter)
      }
      val copies = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 100000).as("doc_id"),
        when(col("doc_id") < 10, col("text"))
          .otherwise(concat(col("text"), lit(" extra suffix tokens")))
          .as("text"))
      DedupStream.processBatchBanded(copies, 5L, "doc_id", "text",
        store, bands, counts, pairs, foldAfter = foldAfter)
      if (foldAfter <= 2) { // the folded run must actually have folded
        val dirs = new java.io.File(counts).listFiles()
          .filter(_.isDirectory).map(_.getName)
        assert(dirs.contains("ingest_batch=-1"),
          s"no folded partition among ${dirs.mkString(",")}")
        assert(dirs.length <= foldAfter + 2) // sentinel + recent batches
      }
      spark.read.parquet(pairs).select("doc_a", "doc_b", "n_bands")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val folded = drive("folded", foldAfter = 2)
    val unfolded = drive("unfolded", foldAfter = 1000)
    assert(folded == unfolded && folded.nonEmpty)
  }

  test("banded probe never puts the band store on a shuffled join side") {
    val work = Files.createTempDirectory("graft_bandplan").toString
    val (store, bands, counts, pairs) = (s"$work/sig",
      s"$work/band_store", s"$work/count_store", s"$work/pairs")
    DedupStream.processBatchBanded(docs, 0L, "doc_id", "text",
      store, bands, counts, pairs)
    val deltaB = Dedup.bandRowsOf(Dedup.minhashSignaturesFor(
      docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 100000).as("doc_id"), col("text")),
      "doc_id", "text"))
    val pairsDf = Dedup.lshCandidatePairsFromBands(
      spark.read.parquet(bands).drop("ingest_batch"),
      spark.read.parquet(counts).drop("ingest_batch"), deltaB)
    // Joins that scan band_store must be broadcast probes: a
    // SortMergeJoin/ShuffledHashJoin above that scan would shuffle the
    // corpus-sized store per batch — the cost this path exists to kill.
    // (Aggregation exchanges above the scan are fine: their input is
    // already bounded by the broadcast joins below.)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def scansBandStore(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("band_store"))
        case _ => false
      }
    val offenders = pairsDf.queryExecution.sparkPlan.collect {
      case j: SortMergeJoinExec if scansBandStore(j) => j
      case j: ShuffledHashJoinExec if scansBandStore(j) => j
    }
    assert(offenders.isEmpty,
      s"band store reached a shuffled join:\n${offenders.mkString("\n")}")
    // and the probe result is still correct off the persisted stores
    val viaStores = pairsDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val recompute = Dedup.lshCandidatePairsIncremental(
      spark.read.parquet(store).drop("ingest_batch"),
      Dedup.minhashSignaturesFor(
        docs.filter(col("doc_id") < 20).select(
          (col("doc_id") + 100000).as("doc_id"), col("text")),
        "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaStores == recompute && viaStores.nonEmpty)
  }

  test("simhash banded family: batches compose, replay no-op, dups found") {
    val work = Files.createTempDirectory("graft_bsim").toString
    val copies = docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") < 10, col("text"))
        .otherwise(concat(col("text"), lit(" extra suffix tokens")))
        .as("text"))
    def run(sub: String, batches: Seq[(org.apache.spark.sql.DataFrame, Long)])
        : Set[(Long, Long, Int)] = {
      val p = s"$work/$sub"
      batches.foreach { case (b, id) =>
        DedupStream.processBatchBandedSimhash(b, id, "doc_id", "text",
          s"$p/sig", s"$p/bands", s"$p/counts", s"$p/pairs")
      }
      spark.read.parquet(s"$p/pairs").select("doc_a", "doc_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val multi = run("multi", Seq((docs, 0L), (copies, 1L)))
    val single = run("single", Seq((docs.unionByName(copies), 0L)))
    assert(multi == single, s"multi ${multi.size} vs single ${single.size}")
    // every exact copy (0-9) must surface as a Hamming-0 pair
    (0L until 10L).foreach { i =>
      assert(multi.contains((i, i + 100000, 0)), s"missing exact pair $i")
    }
    // replay the copies batch: identical end state
    DedupStream.processBatchBandedSimhash(copies, 1L, "doc_id", "text",
      s"$work/multi/sig", s"$work/multi/bands", s"$work/multi/counts",
      s"$work/multi/pairs")
    assert(run("multi", Nil) == multi)
  }

  test("SRP banded family: batches compose and recover injected near-dups") {
    val work = Files.createTempDirectory("graft_bsrp").toString
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 100000).as("vec_id"),
      when(col("vec_id") < 10, col("embedding"))
        .otherwise(transform(col("embedding"),
          (v, i) => when(i === 0, v * lit(1.2f)).otherwise(v)))
        .as("embedding"))
    def run(sub: String, batches: Seq[(org.apache.spark.sql.DataFrame, Long)])
        : Set[(Long, Long, Double)] = {
      val p = s"$work/$sub"
      batches.foreach { case (b, id) =>
        DedupStream.processBatchBandedSrp(b, id, "vec_id", "embedding",
          s"$p/sig", s"$p/bands", s"$p/counts", s"$p/pairs")
      }
      spark.read.parquet(s"$p/pairs").select("doc_a", "doc_b", "cosine")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val multi = run("multi", Seq((emb, 0L), (copies, 1L)))
    val single = run("single", Seq((emb.unionByName(copies), 0L)))
    assert(multi == single, s"multi ${multi.size} vs single ${single.size}")
    // exact copies are cosine-1 pairs; SRP recovery of the perturbed
    // ten is probabilistic per doc but >98% per pair (4 bands of 8) —
    // requiring ≥ 15 of 20 keeps the test deterministic-in-practice
    // while still proving the family finds what it exists to find
    (0L until 10L).foreach { i =>
      assert(multi.contains((i, i + 100000, 1.0)), s"missing exact pair $i")
    }
    val recovered = (0L until 20L).count(i =>
      multi.exists(p => p._1 == i && p._2 == i + 100000))
    assert(recovered >= 15, s"only $recovered/20 injected near-dups recovered")
  }

  test("semantic banded family: batches compose under a pinned sidecar") {
    val work = Files.createTempDirectory("graft_bsem").toString
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 100000).as("vec_id"),
      when(col("vec_id") < 10, col("embedding"))
        .otherwise(transform(col("embedding"),
          (v, i) => when(i === 0, v * lit(1.2f)).otherwise(v)))
        .as("embedding"))
    // ONE centroid space for both runs: centroids are the store's
    // identity (the operator's first batch would otherwise derive a
    // different space per split), so compose ≡ single-shot is defined
    // — and asserted — under a shared pinned sidecar.
    val cents = graft.operators.Similarity.kmeansCentroids(
      emb.unionByName(copies), "vec_id", "embedding",
      k = graft.operators.Dedup.SemK)
    def run(sub: String, batches: Seq[(org.apache.spark.sql.DataFrame, Long)])
        : Set[(Long, Long, Double)] = {
      val p = s"$work/$sub"
      val centsPath = graft.operators.Similarity.centroidsPathOf(s"$p/sig")
      if (!new java.io.File(centsPath).exists())
        cents.coalesce(1).write.parquet(centsPath)
      batches.foreach { case (b, id) =>
        DedupStream.processBatchBandedSemantic(b, id, "vec_id", "embedding",
          s"$p/sig", s"$p/bands", s"$p/counts", s"$p/pairs")
      }
      spark.read.parquet(s"$p/pairs").select("doc_a", "doc_b", "cosine")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val multi = run("multi", Seq((emb, 0L), (copies, 1L)))
    val single = run("single", Seq((emb.unionByName(copies), 0L)))
    assert(multi == single, s"multi ${multi.size} vs single ${single.size}")
    // exact copies co-cluster under ANY centroids → always recovered
    (0L until 10L).foreach { i =>
      assert(multi.contains((i, i + 100000, 1.0)), s"missing exact pair $i")
    }
    // perturbed copies are SemDeDup's cluster-scope recall trade (a
    // ~0.9999-cosine pair can split across a centroid boundary in the
    // tiny sf0.001 clusters) — characterize, don't overclaim
    val recovered = (10L until 20L).count(i =>
      multi.exists(p => p._1 == i && p._2 == i + 100000))
    assert(recovered >= 8, s"only $recovered/10 perturbed near-dups recovered")
    // replay of the copies batch is a no-op (same end state)
    DedupStream.processBatchBandedSemantic(copies, 1L, "vec_id", "embedding",
      s"$work/multi/sig", s"$work/multi/bands", s"$work/multi/counts",
      s"$work/multi/pairs")
    assert(run("multi", Nil) == multi)
  }

  test("bucketized band store: probe prunes buckets, results unchanged") {
    val work = Files.createTempDirectory("graft_bbucket").toString
    val (store, bands, counts, pairs) = (s"$work/sig",
      s"$work/bands", s"$work/counts", s"$work/pairs")
    DedupStream.processBatchBanded(docs, 0L, "doc_id", "text",
      store, bands, counts, pairs)
    DedupStream.bucketizeBandStore(spark, bands, "graft_bandsdb",
      "bands_b", work, buckets = 64)
    val deltaBands = Dedup.bandRowsOf(Dedup.minhashSignaturesFor(
      docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 100000).as("doc_id"), col("text")),
      "doc_id", "text")).persist()
    try {
      val pruned = DedupStream.probeBandsBucketed(spark, "graft_bandsdb",
        "bands_b", deltaBands)
      // the scan must actually prune: the literal IN-set resolves to a
      // bucket subset at planning time, and only those files are read
      val scanStr = pruned.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(scanStr)
      assert(m.isDefined, s"no bucket pruning in plan:\n$scanStr")
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"probe read every bucket: ${m.get.group(0)}")
      // and the pruned probe is a drop-in storeBands: identical pairs
      val storeCounts = spark.read.parquet(counts).drop("ingest_batch")
      def pairsVia(storeBands: org.apache.spark.sql.DataFrame) =
        Dedup.lshCandidatePairsFromBands(storeBands, storeCounts, deltaBands)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val viaPruned = pairsVia(pruned)
      val viaFull = pairsVia(spark.read.parquet(bands).drop("ingest_batch"))
      assert(viaPruned == viaFull && viaPruned.nonEmpty)
      // the loan form: the COMPOSED candidate query (derived from the
      // probe inside the loan) keeps the pruned bucketed scan — the
      // one-shot form above only guarantees it for the probe's own plan
      val (viaLoan, composedPlan) = DedupStream.withProbedBands(
          spark, "graft_bandsdb", "bands_b", deltaBands) { probe =>
        val cand = Dedup.lshCandidatePairsFromBands(
          probe, storeCounts, deltaBands)
        val got = cand.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        (got, cand.queryExecution.executedPlan.toString)
      }
      assert(viaLoan == viaFull)
      val mc = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(composedPlan)
      assert(mc.isDefined,
        s"composed plan lost bucket pruning:\n$composedPlan")
      assert(mc.get.group(1).toInt < mc.get.group(2).toInt,
        s"composed probe read every bucket: ${mc.get.group(0)}")
      // outside any loan, the conf is back to its default
      assert(spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "true")
    } finally deltaBands.unpersist()
  }

  test("a seeded store (sentinel batch -1) pairs with the first stream batch") {
    // BuildMain seeds the signature store under ingest_batch = -1; a
    // seed tagged 0 would collide with the FIRST foreachBatch id and
    // be excluded as that batch's own replay residue — the stream
    // would silently drop every seed-vs-delta pair.
    val work = Files.createTempDirectory("graft_seed").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    graft.etl.StarSchemaBuilder.appendUnique(spark,
      Dedup.minhashSignaturesFor(docs, "doc_id", "text")
        .withColumn("ingest_batch", lit(-1L)),
      store, Seq("doc_id"))
    val copies = docs.filter(col("doc_id") < 10).select(
      (col("doc_id") + 100000).as("doc_id"), col("text"))
    DedupStream.processBatch(copies, 0L, "doc_id", "text", store, pairs)
    val got = spark.read.parquet(pairs).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { i =>
      assert(got.contains((i, i + 100000)),
        s"seed-vs-delta pair $i missing — seed excluded by batch-id collision?")
    }
  }

  test("a store dir holding only crash residue counts as empty") {
    // a driver killed inside the FIRST store append leaves the path
    // existing with only _temporary/_SUCCESS-style entries; the replay
    // must take the empty-store branch, not die reading no footers
    val work = Files.createTempDirectory("graft_dcrash").toString
    val store = s"$work/sig_store"
    val pairs = s"$work/pairs"
    new java.io.File(s"$store/_temporary/0").mkdirs()
    DedupStream.processBatch(docs.limit(30), 0L, "doc_id", "text",
      store, pairs)
    // batch processed as the first: signatures landed, store readable
    assert(spark.read.parquet(store).count() == 30)
    assert(spark.read.parquet(store).columns.contains("ingest_batch"))
  }
}
