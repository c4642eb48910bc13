package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{FsUtils, Tables}
import graft.queries.QueryPack

/** Data-layout operators for scan-side IO elimination — the knobs a
  * 100 TB deployment turns before touching any query plan:
  *
  *  - **Z-order clustering** ([[zorderWrite]]): multi-column locality
  *    via a Morton (bit-interleaved) sort key over quantile-bucketed
  *    columns, so a file's min/max envelope is tight on EVERY layout
  *    column at once — a predicate on any one of them (not just a
  *    lexicographic sort's leading column) skips most files. The
  *    technique lakehouse formats expose as `OPTIMIZE ... ZORDER BY`;
  *    here it is a plain parquet write plus a zone-map manifest, no
  *    table format required.
  *  - **Zone-map manifest** (`_manifest_mm`): per-file min/max of the
  *    layout columns, collected once at write time. Probes prune the
  *    FILE LIST driver-side (the manifest is `nFiles` rows — bounded)
  *    before Spark ever lists the data dir, so skipped files cost
  *    zero footer reads — the same listing-time pruning contract as
  *    the IVF/text index buckets in [[Similarity]]/[[Retrieval]].
  *  - **Bloom manifest** ([[writeBloomManifest]]): per-file bloom
  *    bitsets over a point-lookup key, built with Catalyst's own
  *    runtime-filter aggregate (`bloom_build`, surfaced by
  *    [[graft.GraftExtensions]]). No false negatives, so pruning is
  *    semantics-preserving: bloom-negative files provably hold no
  *    matching row; only bloom-positive files are read and the exact
  *    predicate settles false positives. Needle-in-100TB lookups
  *    become O(files-that-might-match) instead of O(corpus).
  *  - **Salted skew join** (`j15_salted_skew`, via
  *    [[graft.sources.SkewTools.saltedJoin]]): the standard remedy
  *    when a shuffled join key is hot AND the dim side is too big to
  *    broadcast. Result is EXACTLY the plain join's (every fact row
  *    meets precisely the one replica carrying its salt), which is
  *    what lets a DuckDB oracle pin it with an ordinary join.
  *
  * Reference anchors: the reference partitions its fact by 5 hive
  * levels and leans on DuckDB zone maps for everything else
  * (webapp/DASHBOARD_OPTIMIZATION_GUIDE.md's "row-group skipping"
  * notes); these operators are the Spark-native generalization —
  * multi-dimensional clustering and file-grain skipping for the
  * predicates hive levels don't cover.
  */
object Layout extends QueryPack {

  /** Per-column bucket bits: 2^5 = 32 quantile buckets per column —
    * with 2 columns a 10-bit z-space, plenty of resolution for any
    * realistic file count (files ≪ 1024 z-cells). */
  val ZBits = 5

  /** Morton interleave — [[graft.sources.ZOrder.interleave]], the one
    * shared bit cascade (ZOrder ranks by linear scaling against fixed
    * bounds; this module ranks by EQUI-DEPTH quantile buckets, the
    * skew-robust choice for a maintained layout: a heavy-tailed column
    * still spreads rows evenly across cells instead of cramming the
    * head into one). Inputs are 0-based bucket ids < 2^bits. */
  def zValue(buckets: Seq[Column], bits: Int = ZBits): Column =
    graft.sources.ZOrder.interleave(buckets, bits)

  /** Approximate per-column quantile boundaries (as doubles — exact
    * for integral keys below 2^53) — ONE aggregate job for all
    * columns, collected as literals (bounded by 2^bits per column,
    * never by data; the [[Ranking.globalRank]] convention). */
  def quantileBoundaries(df: DataFrame, cols: Seq[String],
                         bits: Int = ZBits): Seq[(String, Seq[Double])] = {
    val nB = 1 << bits
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), lit(probs), lit(10000))
        .as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val bs: Seq[Double] =
        if (row.isNullAt(i)) Seq.empty
        else row.getSeq[Double](i).distinct
      c -> bs
    }
  }

  /** Bucket ids (0-based longs) from persisted boundaries. Equal
    * values always share a bucket, nulls bucket to 0. The SAME
    * function serves the initial build and every append — bucketing
    * is a pure function of the persisted boundaries, so delta rows
    * cluster consistently with the base layout. */
  def bucketsFromBoundaries(bMap: Seq[(String, Seq[Double])]): Seq[Column] =
    bMap.map { case (c, bs) =>
      if (bs.isEmpty) lit(0L)
      else size(filter(array(bs.map(lit(_)): _*),
        b => col(c).cast("double") >= b)).cast("long")
    }

  /** Cluster `df` by the Morton order of the boundary map and write
    * into `dir` (one range shuffle on the z-value, a task-local sort
    * to tighten per-row-group stats, the z-column dropped before the
    * write). Returns nothing; the caller owns manifest publication. */
  private def writeClustered(df: DataFrame, bMap: Seq[(String, Seq[Double])],
                             dir: String, nFiles: Int, bits: Int,
                             mode: String): Unit =
    df.withColumn("__z", zValue(bucketsFromBoundaries(bMap), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(dir)

  /** Zone-map rows (per-file min/max of each layout column) for the
    * given data files. */
  private def manifestRows(spark: SparkSession, cols: Seq[String],
                           files: Seq[String]): DataFrame = {
    val mmAggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(mmAggs.head, mmAggs.tail: _*)
  }

  /** Top-level committed-or-not data files of a layout dir (the
    * manifest and other `_`/`.`-prefixed sidecars excluded). */
  private def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.toString)
  }

  private def baseName(uri: String): String =
    uri.substring(uri.lastIndexOf('/') + 1)

  /** Write `df` to `outDir` clustered by the Morton order of `cols`,
    * plus two sidecars: `_boundaries` (the bucket function — appends
    * MUST reuse it so delta rows cluster consistently) and
    * `_manifest_mm` (the zone map; `nFiles` rows per generation —
    * probes collect it driver-side). The manifest is GENERATIONAL:
    * each build/append commits its zone-map rows as one
    * `gen=<g>` partition, and the partition is the COMMIT —
    * [[zonePrunedRead]] serves only manifested files, so a crash
    * between the data write and the manifest publish leaves invisible
    * orphans (swept by the next [[appendZorder]]), never a partial
    * read, and a replayed generation overwrites exactly its own
    * partition — the [[GenStore]] discipline. */
  def zorderWrite(spark: SparkSession, df: DataFrame, cols: Seq[String],
                  outDir: String, nFiles: Int = 16,
                  bits: Int = ZBits): Unit = {
    import spark.implicits._
    val bMap = quantileBoundaries(df, cols, bits)
    writeClustered(df, bMap, outDir, nFiles, bits, "overwrite")
    bMap.toDF("col", "boundaries").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_boundaries")
    manifestRows(spark, cols, dataFiles(spark, outDir))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_manifest_mm/gen=0")
  }

  /** Committed generation ids of a layout's manifest (bounded: one
    * per build/append/batch, and compaction is a rebuild). */
  def committedGens(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_manifest_mm")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .map(_.stripPrefix("gen=").toLong)
      .filter(g =>
        FsUtils.committedExists(spark, s"$dir/_manifest_mm/gen=$g"))
      .sorted
  }

  /** Append `delta` into an existing z-ordered layout as generation
    * `gen` (default: one past the highest committed generation):
    *
    *  1. drop generation `gen`'s manifest partition if present — a
    *     REPLAY first uncommits its previous attempt, orphaning that
    *     attempt's data files;
    *  2. sweep data files no committed generation references
    *     (uncommitted by contract — delete, don't adopt: adopting
    *     would double rows on the retry that re-appends the same
    *     delta);
    *  3. cluster the delta under the layout's PERSISTED boundaries
    *     (drift in the delta's distribution degrades clustering
    *     tightness, never correctness — the [[Similarity]]
    *     appendIvfIndex contract) and write its files;
    *  4. publish their zone-map rows as the `gen=<g>` manifest
    *     partition — the commit point.
    *
    * A crash at any step leaves every committed generation intact and
    * at worst invisible orphans for the next call's sweep; re-running
    * the same (delta, gen) lands the delta exactly once. Single-writer
    * per layout, like every generational store here. */
  def appendZorder(spark: SparkSession, delta: DataFrame, dir: String,
                   nFiles: Int = 4, bits: Int = ZBits,
                   gen: Option[Long] = None): Long = {
    val mmPath = s"$dir/_manifest_mm"
    val gens = committedGens(spark, dir)
    require(gens.nonEmpty,
      s"no committed layout at $dir — build one with zorderWrite first")
    val g = gen.getOrElse(gens.max + 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // survivors read BEFORE the partition delete (an all-deleted
    // manifest dir would fail schema inference)
    val committed = spark.read.parquet(mmPath)
      .filter(col("gen") =!= g)
      .select("file").collect().map(r => baseName(r.getString(0))).toSet
    val genPath = new org.apache.hadoop.fs.Path(s"$mmPath/gen=$g")
    if (fs.exists(genPath)) fs.delete(genPath, true)
    dataFiles(spark, dir).filterNot(f => committed(baseName(f)))
      .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    val bMap = spark.read.parquet(s"$dir/_boundaries")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
      .toSeq
    val cols = bMap.map(_._1)
    val before = dataFiles(spark, dir).map(baseName).toSet
    writeClustered(delta, bMap, dir, nFiles, bits, "append")
    val newFiles = dataFiles(spark, dir)
      .filterNot(f => before(baseName(f)))
    if (newFiles.nonEmpty)
      manifestRows(spark, cols, newFiles)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$mmPath/gen=$g")
    g
  }

  /** Read `dir` under conjunctive closed-interval predicates
    * `(col, lo, hi)`, pruning the file list through the zone-map
    * manifest first: only files whose [min, max] envelope overlaps
    * EVERY interval are handed to the reader. The exact predicates
    * still apply on top (envelope overlap admits false positives,
    * never false negatives), so the result is precisely the plain
    * filter's. */
  def zonePrunedRead(spark: SparkSession, dir: String,
                     box: Seq[(String, Long, Long)]): DataFrame = {
    val mm = spark.read.parquet(s"$dir/_manifest_mm")
    val overlapping = box.foldLeft(mm) { case (m, (c, lo, hi)) =>
      m.filter(col(s"min_$c") <= hi && col(s"max_$c") >= lo)
    }
    // resolve against the CURRENT dir, not the recorded URI — file
    // names are write-unique, and re-anchoring keeps the manifest
    // valid across dir swaps ([[compactLayout]]) and relocations
    val files = overlapping.select("file").collect()
      .map(r => s"$dir/${baseName(r.getString(0))}")
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    box.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
  }

  /** Build a `_manifest_bloom_<keyCol>` sidecar for `dir`: one bloom
    * bitset per data file over `keyCol`, via Catalyst's own
    * `bloom_build` aggregate (XxHash64 inserts — identical hashing to
    * the probe side, so membership of every present key is
    * guaranteed). Sized for ~100k keys/file at ~1% fp; the whole
    * manifest is nFiles × numBits/8 bytes — driver-collectable by
    * construction. */
  def writeBloomManifest(spark: SparkSession, dir: String, keyCol: String,
                         estItems: Long = 100000L,
                         numBits: Long = 1L << 20): Unit = {
    graft.GraftExtensions.registerAll(spark)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(call_function("bloom_build", col(keyCol),
        lit(estItems), lit(numBits)).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest_bloom_$keyCol")
  }

  /** Point-lookup read: keep only the files whose bloom might contain
    * at least one of `keys` (tested driver-side against the bounded
    * manifest — XxHash64 with Catalyst's default seed, the exact hash
    * `bloom_build` inserted), then apply the exact IN filter. A
    * bloom-negative file provably holds none of the keys, so pruning
    * never drops a match; false positives are settled by the filter. */
  def bloomPrunedRead(spark: SparkSession, dir: String, keyCol: String,
                      keys: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val hashes = keys.map(k =>
      new XxHash64(Seq(Literal(k))).eval(null).asInstanceOf[Long])
    val files = spark.read.parquet(s"$dir/_manifest_bloom_$keyCol")
      .collect()
      .filter { r =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        hashes.exists(bf.mightContainLong)
      }
      .map(r => s"$dir/${baseName(r.getAs[String]("file"))}")
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(keyCol).isin(keys.map(k => k: Any): _*))
  }

  /** Compaction: fold every committed generation back into a single
    * freshly-clustered gen-0 build. Rebuilds via a STAGING dir + an
    * atomic-ish publish (copy-free dir swap), so probes against the
    * old layout stay valid until the swap and a crash mid-compaction
    * leaves the old layout untouched. Re-derives boundaries against
    * the accumulated distribution — the cure for append-era drift.
    * Returns the folded row count. Single-writer, and (as with
    * [[GenStore]] folds) concurrent probes should tolerate listed-
    * then-deleted files via `spark.sql.files.ignoreMissingFiles` or
    * the single-reader contract. */
  def compactLayout(spark: SparkSession, dir: String,
                    nFiles: Int = 16, bits: Int = ZBits): Long = {
    graft.streaming.DedupStream.recoverCompaction(spark, dir)
    val mmPath = s"$dir/_manifest_mm"
    require(FsUtils.committedExists(spark, mmPath),
      s"no committed layout at $dir — nothing to compact")
    val committed = spark.read.parquet(mmPath)
      .select("file").collect()
      .map(r => s"$dir/${baseName(r.getString(0))}")
    val cols = spark.read.parquet(s"$dir/_boundaries")
      .collect().map(_.getString(0)).toSeq
    val rows = spark.read.parquet(committed.toIndexedSeq: _*)
    val n = rows.count()
    // the DedupStream compaction suffix conventions, so
    // recoverCompaction heals a crash at any point of the swap
    val tmp = dir + graft.streaming.DedupStream.CompactTmpSuffix
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    zorderWrite(spark, rows, cols, tmp, nFiles, bits)
    graft.streaming.DedupStream.swapDirs(fs, p,
      new org.apache.hadoop.fs.Path(tmp))
    n
  }

  // ----------------------------------------------------------- fixtures

  /** Query-private z-ordered lineitem layout (the [[Similarity]]
    * fixed-sidecar convention: `oracleSql` is static, and verify is
    * single-process last-write-wins). Cached across runs on a
    * (source listing, params) fingerprint written LAST, so a crashed
    * build is rebuilt, never trusted. */
  val zorderSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_zorder_lineitem").getAbsolutePath

  val ZCols = Seq("l_suppkey", "l_partkey")

  private def layoutFingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val listing = fs.listStatus(p).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(";")
    val key = s"$d|${ZCols.mkString(",")}|$ZBits|bloom:l_orderkey|v2|$listing"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map(b => "%02x".format(b & 0xff)).mkString
  }

  /** Build the layout + both manifests unless an identical build is
    * already present. */
  private def ensureZorderSidecar(s: SparkSession, d: String): Unit =
    this.synchronized {
      val fpPath = s"$zorderSidecar/_fingerprint"
      val fp = layoutFingerprint(s, d)
      if (FsUtils.readString(s, fpPath).contains(fp)) return
      zorderWrite(s, Tables.load(s, d, "lineitem"), ZCols, zorderSidecar)
      writeBloomManifest(s, zorderSidecar, "l_orderkey")
      FsUtils.writeString(s, fpPath, fp)
    }

  /** Query-private layout for the APPEND path — base rows clustered
    * first, the rest arriving as a delta under the persisted
    * boundaries. Separate dir from [[zorderSidecar]] so neither
    * query's cache schedule can disturb the other. */
  val zorderAppendSidecar: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_zorder_append").getAbsolutePath

  /** Base/delta split: l_orderkey is dense from 0 at every SF, so
    * both sides are non-empty at sf0.001 and up. */
  private val AppendSplit = 700L

  private def ensureAppendSidecar(s: SparkSession, d: String): Unit =
    this.synchronized {
      val fpPath = s"$zorderAppendSidecar/_fingerprint"
      val fp = layoutFingerprint(s, d) + "|append_v1"
      if (FsUtils.readString(s, fpPath).contains(fp)) return
      val li = Tables.load(s, d, "lineitem")
      zorderWrite(s, li.filter(col("l_orderkey") < AppendSplit), ZCols,
        zorderAppendSidecar)
      appendZorder(s, li.filter(col("l_orderkey") >= AppendSplit),
        zorderAppendSidecar)
      FsUtils.writeString(s, fpPath, fp)
    }

  private val ProbeCols =
    Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
      "l_extendedprice")

  /** Bounds chosen non-empty at every SF dir (suppkey is dense from 0
    * at all scales; partkey spans 0..199 even at sf0.001). */
  private val BoxSupp = (2L, 4L)
  private val BoxPart = (40L, 120L)
  private val SecondaryPart = (40L, 80L)
  private val LookupKeys = Seq(1L, 7L, 42L, 123L, 999L)

  // ------------------------------------------------------------- queries

  def queries: Map[String, QFn] = Map(
    // 2-D box probe through the zone-map manifest: both layout
    // columns carry range predicates, the manifest prunes the file
    // list driver-side, the exact filter settles envelope false
    // positives. Values are the raw table's — the layout is a pure
    // re-clustering — so the oracle filters lineitem directly.
    "layout_zorder_box" -> ((s, d) => {
      ensureZorderSidecar(s, d)
      zonePrunedRead(s, zorderSidecar,
          Seq(("l_suppkey", BoxSupp._1, BoxSupp._2),
            ("l_partkey", BoxPart._1, BoxPart._2)))
        .select(ProbeCols.map(col): _*)
    }),

    // Secondary-column probe — the case a lexicographic sort cannot
    // skip for: no predicate on the leading dimension at all, yet the
    // Morton envelopes stay tight on l_partkey, so most files still
    // prune (LayoutSpec pins the file counts).
    "layout_zorder_secondary" -> ((s, d) => {
      ensureZorderSidecar(s, d)
      zonePrunedRead(s, zorderSidecar,
          Seq(("l_partkey", SecondaryPart._1, SecondaryPart._2)))
        .select(ProbeCols.map(col): _*)
    }),

    // The append path end-to-end: base build + delta append under the
    // persisted boundaries, probed through the zone map exactly like
    // the one-shot layout. The result is the full corpus's box — an
    // append can neither lose rows (manifest-last commit) nor double
    // them (orphan sweep before re-append) — so the oracle is the
    // same plain filter over lineitem.
    "layout_zorder_append" -> ((s, d) => {
      ensureAppendSidecar(s, d)
      zonePrunedRead(s, zorderAppendSidecar,
          Seq(("l_suppkey", BoxSupp._1, BoxSupp._2),
            ("l_partkey", BoxPart._1, BoxPart._2)))
        .select(ProbeCols.map(col): _*)
    }),

    // Needle-in-corpus point lookup through the per-file bloom
    // manifest: only bloom-positive files are read (no false
    // negatives ⇒ no lost matches), the IN filter settles the rest.
    "layout_bloom_lookup" -> ((s, d) => {
      ensureZorderSidecar(s, d)
      bloomPrunedRead(s, zorderSidecar, "l_orderkey", LookupKeys)
        .select(ProbeCols.map(col): _*)
    }),

    // J15 (beyond the reference's J1-J14): the salted fact ⋈ dim
    // join ([[graft.sources.SkewTools.saltedJoin]] — the manual
    // remedy when the dim outgrows broadcast and AQE's skew split
    // can't engage), result ≡ the plain join — the oracle states it
    // as one.
    "j15_salted_skew" -> ((s, d) => {
      val big = graft.Roles.rates(s, d)
        .withColumnRenamed("provider_reference_id", "provider_group_id")
        .select("l_orderkey", "l_linenumber", "provider_group_id",
          "negotiated_rate")
      val dim = graft.Roles.providers(s, d)
        .select("provider_group_id", "provider_name", "state")
      graft.sources.SkewTools.saltedJoin(big, dim, "provider_group_id",
          nSalts = 8, joinType = "inner")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("provider_group_id"),
          graft.functions.NormExprs.pround(col("negotiated_rate"), 2)
            .as("negotiated_rate"),
          col("provider_name"), col("state"))
    })
  )

  def oracles: Map[String, String] = {
    val probeSql = ProbeCols.mkString(", ")
    Map(
      "layout_zorder_box" -> s"""
        SELECT $probeSql FROM lineitem
        WHERE l_suppkey BETWEEN ${BoxSupp._1} AND ${BoxSupp._2}
          AND l_partkey BETWEEN ${BoxPart._1} AND ${BoxPart._2}""",

      "layout_zorder_secondary" -> s"""
        SELECT $probeSql FROM lineitem
        WHERE l_partkey BETWEEN ${SecondaryPart._1} AND ${SecondaryPart._2}""",

      "layout_zorder_append" -> s"""
        SELECT $probeSql FROM lineitem
        WHERE l_suppkey BETWEEN ${BoxSupp._1} AND ${BoxSupp._2}
          AND l_partkey BETWEEN ${BoxPart._1} AND ${BoxPart._2}""",

      "layout_bloom_lookup" -> s"""
        SELECT $probeSql FROM lineitem
        WHERE l_orderkey IN (${LookupKeys.mkString(", ")})""",

      "j15_salted_skew" -> s"""
        WITH rates AS (${graft.RolesSql.rates}),
             providers AS (${graft.RolesSql.providers})
        SELECT l_orderkey, l_linenumber,
               r.provider_reference_id AS provider_group_id,
               floor(negotiated_rate * 100.0 + 0.5) / 100.0
                 AS negotiated_rate,
               provider_name, state
        FROM rates r JOIN providers p
          ON r.provider_reference_id = p.provider_group_id"""
    )
  }
}
