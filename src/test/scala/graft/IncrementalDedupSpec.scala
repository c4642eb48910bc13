package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental LSH against a signature store: the delta-batch path
  * must produce exactly the pairs a full re-run would produce for the
  * delta, and the store must be maintainable with the idempotent
  * anti-join append. */
class IncrementalDedupSpec extends SparkSpec {

  private def base = Tables.load(spark, sf0001, "documents")
    .select("doc_id", "text")

  /** Ingest delta: the same injected-copy construction the fixture
    * queries use (exact copies of 0-9, near-copies of 10-19). */
  private def delta = base.filter(col("doc_id") < 20).select(
    (col("doc_id") + 100000).as("doc_id"),
    when(col("doc_id") < 10, col("text"))
      .otherwise(concat(col("text"), lit(" extra suffix tokens"))).as("text"))

  test("delta candidates == full-corpus candidates restricted to the delta") {
    val storeSig = Dedup.minhashSignaturesFor(base, "doc_id", "text")
    val newSig = Dedup.minhashSignaturesFor(delta, "doc_id", "text")
    val full = Dedup.lshCandidatePairs(storeSig.unionByName(newSig))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val newIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = full.filter(p => newIds(p._1) || newIds(p._2))
    val incr = Dedup.lshCandidatePairsIncremental(storeSig, newSig)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty) // the injected dups guarantee candidates
    assert(incr == expected)
    // and no old-old pair leaked through
    assert(!incr.exists(p => !newIds(p._1) && !newIds(p._2)))
  }

  test("semantic incremental == full run restricted to the delta") {
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").as("emb"))
    val deltaE = emb.filter(col("vec_id") < 20).select(
      (col("vec_id") + 100000).as("vec_id"),
      when(col("vec_id") < 10, col("emb"))
        .otherwise(transform(col("emb"),
          (v, i) => when(i === 0, v * lit(1.2f)).otherwise(v))).as("emb"))
    val all = emb.unionByName(deltaE)
    // one centroid space for both paths — the restriction property is
    // defined under shared centroids (the store pins them in practice)
    val cents = graft.operators.Similarity.kmeansCentroids(
      all, "vec_id", "emb", k = Dedup.SemK)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = rows(Dedup.semanticDupes(all, cents, Dedup.SrpTau))
    val incr = rows(Dedup.semanticDupesIncremental(
      emb, deltaE, cents, Dedup.SrpTau))
    // delta ids are minted above every store id, so the full run's
    // delta-sided witness rows ARE the incremental result
    assert(incr == full.filter(_._1 >= 100000L),
      s"incremental ${incr.size} vs restricted full " +
        s"${full.count(_._1 >= 100000L)}")
  }

  test("banded path == incremental path across cap boundaries (seeded random)") {
    // The fixture corpora never push a bucket past the cap, so the
    // fixture specs can't catch a cap-accounting drift between the
    // recompute and banded paths. Build corpora of exact-duplicate
    // clusters whose sizes straddle a small cap (5): clusters at or
    // under it must pair, clusters over it must be dropped, and the
    // banded path must agree with the recompute path on every seed —
    // with the store's bucket counts split into two LOG-STRUCTURED
    // partials, exercising the sum-of-partials semantics foldCounts
    // relies on.
    import spark.implicits._
    val cap = 5
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
        "foxtrot", "golf", "hotel", "india", "juliet")
      def text() = Seq.fill(6 + rnd.nextInt(5))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // clusters of size 2..9; ids are globally unique
      var nextId = 0L
      val docsSeq = (0 until 8).flatMap { _ =>
        val t = text()
        val size = 2 + rnd.nextInt(8)
        (0 until size).map { _ =>
          nextId += 1; (nextId, t)
        }
      }
      val all = docsSeq.toDF("doc_id", "text")
      // delta = every 3rd doc; store = the rest (disjoint by id)
      val delta = all.filter(col("doc_id") % 3 === 0)
      val store = all.filter(col("doc_id") % 3 =!= 0)
      val storeSig = Dedup.minhashSignaturesFor(store, "doc_id", "text")
      val deltaSig = Dedup.minhashSignaturesFor(delta, "doc_id", "text")
      val expected = Dedup
        .lshCandidatePairsIncremental(storeSig, deltaSig, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val storeBands = Dedup.bandRowsOf(storeSig)
      val partials = Seq(0, 1).map { half =>
        Dedup.bandRowsOf(storeSig.filter(col("doc_id") % 2 === half))
          .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
      }.reduce(_ unionByName _)
      val banded = Dedup.lshCandidatePairsFromBands(storeBands, partials,
          Dedup.bandRowsOf(deltaSig), maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == expected,
        s"seed $seed: banded ${banded.size} vs incremental ${expected.size}")
      // and the cap genuinely bit on this corpus (the test is vacuous
      // if no cluster exceeded it): some over-cap cluster must exist
      val clusterSizes = docsSeq.groupBy(_._2).values.map(_.size)
      assert(clusterSizes.exists(_ > cap), s"seed $seed never crossed the cap")
    }
  }

  test("signature store: append-unique is idempotent, delta composes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigstore")
      .toString + "/sig"
    val storeSig = Dedup.minhashSignaturesFor(base, "doc_id", "text")
    graft.etl.StarSchemaBuilder.appendUnique(spark, storeSig, dir, Seq("doc_id"))
    graft.etl.StarSchemaBuilder.appendUnique(spark, storeSig, dir, Seq("doc_id"))
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == storeSig.count()) // second append added nothing
    val newSig = Dedup.minhashSignaturesFor(delta, "doc_id", "text")
    graft.etl.StarSchemaBuilder.appendUnique(spark, newSig, dir, Seq("doc_id"))
    assert(spark.read.parquet(dir).count() == n1 + newSig.count())
    // incremental candidates off the FILE store match the in-memory run
    val fromStore = Dedup.lshCandidatePairsIncremental(
      spark.read.parquet(dir).join(newSig.select("doc_id"),
        Seq("doc_id"), "left_anti"),
      newSig).count()
    val inMem = Dedup.lshCandidatePairsIncremental(storeSig, newSig).count()
    assert(fromStore == inMem)
  }
}
