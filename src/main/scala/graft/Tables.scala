package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata loaders + the schema-tolerant projected scan.
  *
  * The tolerant scan mirrors the reference's `read_parquet_safely`
  * contract (prod_etl/ETL_1.py:201-243): select only wanted columns,
  * back-fill the missing ones as typed nulls so downstream projections
  * never fail. Column pruning happens at the parquet reader (check
  * ReadSchema in .explain), so at 100 TB only the requested columns
  * are ever decoded.
  */
object Tables {
  /** Load a testdata table, rebalancing pathological input splits.
    *
    * The testdata files are single-row-group parquet, which the reader
    * cannot split — every downstream operator would run on ONE task no
    * matter how many cores exist. A production dataset arrives as many
    * splittable files, so this branch never fires at scale; locally it
    * restores the parallelism a real cluster gets for free. Target
    * partition count is sized from file bytes (~256 KiB per partition,
    * capped at the session's core count) so tiny dims are not shuffled.
    */
  /** Resolved base-table frames per (session, path). Building a scan —
    * relation resolution, file listing, footer/schema read — costs
    * ~40 ms per `spark.read.parquet` call, paid per query on the
    * serving path (a routed dashboard query re-derives its defining
    * plan from these loaders every time). The frame is immutable and
    * reusable, so cache it; same LRU bound and rationale as
    * [[graft.plans.GoldCatalog]]'s scan cache. Base tables are
    * read-only inputs here — a pipeline that rewrites one mid-session
    * must call [[invalidateCache]]. */
  private val LoadCacheMax = 64
  private val loadCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]) =
        size() > LoadCacheMax
    })

  def invalidateCache(): Unit = loadCache.clear()

  /** Scoped invalidation (r16): drop only the cached load frames
    * under `dir`, for every session — a serving refresh of ONE data
    * dir must not blast the whole JVM's resolved listings (a second
    * server or a batch session would silently re-list its untouched
    * tables, and a server whose dir is mid-rewrite could pick the new
    * files up before its own refresh epoch swapped). */
  def invalidate(dir: String): Unit = loadCache.synchronized {
    val prefix = dir.stripSuffix("/") + "/"
    loadCache.keySet().removeIf(
      (k: (SparkSession, String)) => k._2.startsWith(prefix))
    ()
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, s"$dir/$name.parquet")
    val hit = loadCache.synchronized(loadCache.get(key))
    if (hit != null) hit
    else {
      // built outside the monitor (listing can take a while; racing
      // builders are harmless — the loser's frame is discarded)
      val built = buildLoad(spark, dir, name)
      loadCache.synchronized {
        val raced = loadCache.get(key)
        if (raced != null) raced
        else { loadCache.put(key, built); built }
      }
    }
  }

  private def buildLoad(spark: SparkSession, dir: String,
                        name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val bytes = new java.io.File(s"$dir/$name.parquet").length()
    // Rebalance width — overridable per SESSION (`graft.load.parallelism`):
    // batch sessions want every core (default), while a SERVING session
    // wants narrow scans: a 32-task stage over a small hot slice is
    // dominated by task overhead, and 4 concurrent dashboard requests x
    // 32 tasks saturate the scheduler with work that isn't data
    // (r15, measured: the serving legs inflated 3-4x under a 4-client
    // load while the 1-task gold legs didn't inflate at all).
    val cores =
      try spark.conf.get("graft.load.parallelism",
        spark.sparkContext.defaultParallelism.toString).toInt
      catch { case _: NumberFormatException =>
        spark.sparkContext.defaultParallelism }
    val target = math.min(cores.toLong,
      math.max(1L, bytes / (256L << 10))).toInt
    if (target <= 1) df
    else {
      // Estimate the scan's split count from the same inputs Spark's
      // file bin-packing uses rather than asking df.rdd.getNumPartitions:
      // touching .rdd runs analysis + optimization + physical planning
      // for the scan (measured ~30-60 ms per load), which dominates the
      // serving path where this loader runs once per dashboard query.
      // Over- vs under-estimating by a split only changes a repartition
      // decision, never results.
      def bytesConf(key: String, dflt: Long): Long =
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get(key, dflt.toString))
        catch { case _: Exception => dflt }
      val maxPartition = bytesConf("spark.sql.files.maxPartitionBytes", 128L << 20)
      val openCost = bytesConf("spark.sql.files.openCostInBytes", 4L << 20)
      val maxSplit = math.min(maxPartition,
        math.max(openCost, (bytes + openCost) / math.max(1, cores)))
      val estSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
      if (estSplits < target) df.repartition(target) else df
    }
  }

  /** Corrupt-parquet salvage read (SURVEY §2.1 S2): skip unreadable
    * files, keep every valid row-group — the reference's ingest
    * tolerance (src/utils/chunk_processor.py:34-50). The option is
    * scoped to THIS reader on purpose: globally enabling
    * `spark.sql.files.ignoreCorruptFiles` would let a corrupt file
    * silently shrink any query's input; outside the salvage ingest
    * path, data loss should fail loudly. */
  def readSalvage(spark: SparkSession, path: String): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").parquet(path)

  /** PER-ROWGROUP corrupt-parquet salvage — the reference's actual
    * granularity (src/utils/chunk_processor.py:34-50, which iterates
    * row groups and skips only the bad ones), where [[readSalvage]]'s
    * `ignoreCorruptFiles` drops a whole file at its first bad page.
    *
    * Mechanics, all parquet-footer-driven and per-file parallel:
    *  1. PROBE: each row group is decoded in isolation (a reader
    *     scoped to the group's byte range via `withRange` — groups are
    *     selected by midpoint, so the range covering exactly one block
    *     reads exactly it). A decode error marks only that group bad.
    *  2. RECOVER: for a file with bad groups, the good groups are
    *     RAW-COPIED (`ParquetFileWriter.appendRowGroup` — byte-level
    *     column-chunk copy, no re-encode, schema + key-value metadata
    *     preserved so Spark sees the identical table schema) into a
    *     recovered file under `salvageDir`.
    *  3. READ: untouched files are read in place; recovered files
    *     stand in for their corrupt originals.
    *
    * The probe+rewrite fans out over the cluster (one task per file) —
    * at 100 TB salvage cost is one decode pass over suspect files,
    * not a driver loop. Like [[readSalvage]] this is scoped to the
    * ingest-repair path: the listing/probe runs eagerly at call time,
    * and the recovered copies live in `salvageDir` (defaulting to a
    * `<path>_salvage` sibling on the source's own filesystem, so
    * recovered files are reachable from every node) rather than
    * mutating the source. Returns an empty frame (source schema) when
    * nothing is recoverable. */
  def readSalvageRowGroups(spark: SparkSession, path: String,
                           salvageDir: String = null): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    val rootSt = fs.getFileStatus(root)
    val files = (if (rootSt.isDirectory) fs.listStatus(root).toSeq
                 else Seq(rootSt))
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString)
    // recovered copies default to a SIBLING dir on the SOURCE's
    // filesystem — a driver-local temp dir would be unreadable from
    // the driver once executors on other hosts wrote into their own
    // local copies of it (and vice versa)
    // per-RUN recovery dir: reusing one shared dir across salvage
    // runs would let the rename-defer below serve a PREVIOUS run's
    // recovered rows after the source file was rewritten and
    // re-salvaged (rename-to-existing fails on HDFS/object stores,
    // deferring to the stale winner)
    val out =
      if (salvageDir != null) salvageDir
      else path.stripSuffix("/") + "_salvage_" +
        java.util.UUID.randomUUID().toString.take(8)
    // executors must probe with the SESSION's Hadoop settings
    // (credentials, endpoints for object stores) — a bare
    // `new Configuration()` on the task classpath lacks them and
    // would silently fail to open every remote file
    val confProps: Array[(String, String)] = {
      val b = Array.newBuilder[(String, String)]
      val it = hconf.iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val sc = spark.sparkContext
    val propsB = sc.broadcast(confProps)
    val readable: Seq[String] =
      if (files.isEmpty) Nil
      else sc.parallelize(files,
          math.min(files.size, math.max(1, sc.defaultParallelism)))
        .map(f => salvageFile(f, out, propsB.value)).collect().toSeq.flatten
    if (readable.isEmpty) readSalvage(spark, path).limit(0)
    else spark.read.parquet(readable: _*)
  }

  /** Probe one file's row groups; returns the path to read for this
    * file — the original (all groups good), a recovered copy (some
    * good), or None (footer unreadable / nothing decodes). Runs on
    * executors: builds its own Hadoop conf from the task classpath. */
  private def salvageFile(file: String, outDir: String,
                          confProps: Array[(String, String)])
      : Option[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val conf = new org.apache.hadoop.conf.Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(file)
    val in = HadoopInputFile.fromPath(p, conf)
    val footer =
      try {
        val r = ParquetFileReader.open(in)
        try r.getFooter finally r.close()
      } catch { case _: Exception => return None }
    val blocks = footer.getBlocks
    val good = (0 until blocks.size).filter { i =>
      groupDecodes(in, conf, blocks.get(i))
    }
    if (good.size == blocks.size) Some(file)
    else if (good.isEmpty) None
    else {
      val outPath = new org.apache.hadoop.fs.Path(outDir,
        p.getName.stripSuffix(".parquet") + "_salvaged.parquet")
      // write-to-temp + rename-commit: duplicate task attempts
      // (speculation, retry-after-partial-write) within THIS run must
      // not interleave bytes in the shared recovery dir — the loser of
      // the rename defers to the winner's complete file (salvage is
      // deterministic, both attempts wrote the same groups; cross-RUN
      // staleness is impossible because each run gets its own dir)
      val tmpPath = new org.apache.hadoop.fs.Path(outDir,
        "." + p.getName.stripSuffix(".parquet") + "_salvaged." +
          java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val writer = new org.apache.parquet.hadoop.ParquetFileWriter(
        HadoopOutputFile.fromPath(tmpPath, conf),
        footer.getFileMetaData.getSchema,
        org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE,
        128L << 20, 8388608)
      writer.start()
      val sis = in.newStream()
      try good.foreach(i => writer.appendRowGroup(sis, blocks.get(i), false))
      finally sis.close()
      writer.end(footer.getFileMetaData.getKeyValueMetaData)
      val ofs = outPath.getFileSystem(conf)
      if (!ofs.rename(tmpPath, outPath)) {
        // another attempt committed first: keep its file
        ofs.delete(tmpPath, false)
        if (!ofs.exists(outPath)) return None
      }
      Some(outPath.toString)
    }
  }

  /** Decode every row of ONE row group (reader scoped to the group's
    * byte range); any throw marks the group corrupt. Decoding — not
    * just footer inspection — is the only honest probe: parquet holds
    * no whole-group checksum, so a group "exists" until its pages fail
    * to decompress/decode. */
  private def groupDecodes(in: org.apache.parquet.io.InputFile,
                           conf: org.apache.hadoop.conf.Configuration,
                           block: org.apache.parquet.hadoop.metadata.BlockMetaData)
      : Boolean =
    try {
      val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
        .withRange(block.getStartingPos,
          block.getStartingPos + block.getCompressedSize)
        .build()
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in, opts)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        var pages = r.readNextRowGroup()
        if (pages == null) return false
        while (pages != null) {
          val io = new org.apache.parquet.io.ColumnIOFactory()
            .getColumnIO(schema)
          val rr = io.getRecordReader(pages,
            new org.apache.parquet.example.data.simple.convert
              .GroupRecordConverter(schema))
          var n = pages.getRowCount
          while (n > 0) { rr.read(); n -= 1 }
          pages = r.readNextRowGroup()
        }
        true
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Schema-tolerant projected scan (SURVEY §2.1 S4). */
  def readTolerant(spark: SparkSession, path: String,
                   wanted: Seq[(String, String)]): DataFrame = {
    val df = spark.read.parquet(path)
    val have = df.columns.toSet
    df.select(wanted.map { case (n, t) =>
      if (have(n)) col(n).cast(t).as(n) else lit(null).cast(t).as(n)
    }: _*)
  }
}

/** Maps the driver's TPC-H-ish testdata onto the reference's MRF roles
  * (FIXTURES.md §5): lineitem → negotiated-rate rows, supplier →
  * provider groups, part → code dim, nation/region → geography.
  *
  * Every derivation here has an exact SQL twin in `RolesSql` used by
  * the DuckDB oracle — keep the two in lockstep.
  */
object Roles {
  import graft.functions.NormExprs._

  /** lineitem viewed as the raw negotiated-rates feed. */
  def rates(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("string").as("billing_code"),
      when(col("l_partkey") % 10 === 0, "HCPCS").otherwise("CPT").as("code_type"),
      when(col("l_returnflag") === "R", "professional")
        .otherwise("institutional").as("billing_class"),
      col("l_extendedprice").as("negotiated_rate"),
      col("l_suppkey").cast("string").as("provider_reference_id"),
      col("l_suppkey"),
      when(col("l_linestatus") === "O", "negotiated")
        .otherwise("fee schedule").as("negotiated_type"),
      lit("ffs").as("negotiation_arrangement"),
      concat(lit("payer_"), (col("l_suppkey") % 5).cast("string")).as("payer_slug"),
      yearMonth(col("l_shipdate")).as("year_month"),
      col("l_shipdate").as("last_updated_on"),
      when(col("l_linenumber") === 7, "9999-12-31")
        .when(col("l_linenumber") === 6, lit(null).cast("string"))
        .otherwise(date_format(col("l_shipdate"), "yyyy-12-31")).as("expiration_date"),
      // messy service_codes corpus (prod_etl/notebook.py:48-62 shapes)
      when(col("l_linenumber") === 1, """["02","11"]""")
        .when(col("l_linenumber") === 2, "[]")
        .when(col("l_linenumber") === 3, "11,22")
        .when(col("l_linenumber") === 4, "['n','u','l']")
        .when(col("l_linenumber") === 5, "02; 11 |31")
        .otherwise(lit(null).cast("string")).as("service_codes"))

  /** supplier (⋈ nation) viewed as the provider-group table. */
  def providers(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"), "left")
      .select(
        col("s_suppkey").cast("string").as("provider_group_id"),
        col("s_name").as("provider_name"),
        col("n_name").as("state"),
        col("s_acctbal"))
  }
}

/** SQL twins of [[Roles]] for the DuckDB oracle. */
object RolesSql {
  /** Same projection as Roles.rates, as a DuckDB CTE body. */
  val rates: String = """
    SELECT
      l_orderkey, l_linenumber,
      CAST(l_partkey AS VARCHAR) AS billing_code,
      CASE WHEN l_partkey % 10 = 0 THEN 'HCPCS' ELSE 'CPT' END AS code_type,
      CASE WHEN l_returnflag = 'R' THEN 'professional' ELSE 'institutional' END AS billing_class,
      l_extendedprice AS negotiated_rate,
      CAST(l_suppkey AS VARCHAR) AS provider_reference_id,
      l_suppkey,
      CASE WHEN l_linestatus = 'O' THEN 'negotiated' ELSE 'fee schedule' END AS negotiated_type,
      'ffs' AS negotiation_arrangement,
      'payer_' || CAST(l_suppkey % 5 AS VARCHAR) AS payer_slug,
      strftime(l_shipdate, '%Y-%m') AS year_month,
      l_shipdate AS last_updated_on,
      CASE WHEN l_linenumber = 7 THEN '9999-12-31'
           WHEN l_linenumber = 6 THEN NULL
           ELSE strftime(l_shipdate, '%Y-12-31') END AS expiration_date,
      CASE WHEN l_linenumber = 1 THEN '["02","11"]'
           WHEN l_linenumber = 2 THEN '[]'
           WHEN l_linenumber = 3 THEN '11,22'
           WHEN l_linenumber = 4 THEN '[''n'',''u'',''l'']'
           WHEN l_linenumber = 5 THEN '02; 11 |31'
           ELSE NULL END AS service_codes
    FROM lineitem"""

  val providers: String = """
    SELECT CAST(s_suppkey AS VARCHAR) AS provider_group_id,
           s_name AS provider_name, n_name AS state, s_acctbal
    FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey"""
}
