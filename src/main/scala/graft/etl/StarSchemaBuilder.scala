package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Roles
import graft.functions.NormExprs._

/** Batch star-schema ETL: the write side of the reference's prod
  * pipeline (SURVEY §2.1 S11-S15, §2.3 J11/J12, §3.2).
  *
  * Scale design:
  *  - the normalized base is computed once and feeds every dim/xref
  *    derivation (one scan, several cheap shuffles on small distinct
  *    sets);
  *  - append-unique and upsert are anti-joins on slim key projections —
  *    the existing dataset is never rewritten except for the rows that
  *    change (and the fact sink only rewrites touched partitions via
  *    dynamic partition overwrite);
  *  - the fact is hive-partitioned `state=/year_month=/` so queries with
  *    the webapp's mandatory state+year_month filters prune at the file
  *    listing (PruneFileSourcePartitions), the decisive 100 TB lever;
  *  - zstd compression everywhere (prod_etl/ETL_1.py:372).
  */
object StarSchemaBuilder {

  /** Normalized base frame: rates joined to providers with uids minted
    * (prod_etl/ETL_1.py:250-279), staged so each md5 is computed once. */
  def base(spark: SparkSession, dir: String): DataFrame = {
    val r = Roles.rates(spark, dir)
    val p = Roles.providers(spark, dir)
    r.join(broadcast(p),
        r("provider_reference_id") === p("provider_group_id"), "left")
      .withColumn("version", defaultVersion(lit(null).cast("string")))
      .withColumn("pos_members", posMembers(col("service_codes")))
      .withColumn("pos_set_id", posSetId(col("pos_members")))
      .withColumn("pg_uid", pgUid(col("payer_slug"), col("version"),
        col("provider_reference_id"), col("provider_reference_id")))
  }

  /** The six dims/xrefs of prod_etl/ETL_1.py:281-352: (frame, dedup/
    * append-unique keys) per name. */
  def dims(b: DataFrame): Map[String, (DataFrame, Seq[String])] = Map(
    "dim_code" -> (b.select(col("code_type"), col("billing_code").as("code"))
      .na.drop().dropDuplicates("code_type", "code"),
      Seq("code_type", "code")),
    "dim_payer" -> (b.select(col("payer_slug"), col("version"))
      .dropDuplicates("payer_slug"), Seq("payer_slug")),
    "dim_provider_group" -> (b.select(col("pg_uid"), col("payer_slug"),
      col("provider_reference_id").as("provider_group_id_raw"), col("version"))
      .dropDuplicates("pg_uid"), Seq("pg_uid")),
    "dim_pos_set" -> (b.select(col("pos_set_id"), col("pos_members"))
      .dropDuplicates("pos_set_id"), Seq("pos_set_id")),
    "xref_pos" -> (b.select(col("pos_set_id"), col("pos_members"))
      .dropDuplicates("pos_set_id")
      .select(col("pos_set_id"), explode(col("pos_members")).as("pos")),
      Seq("pos_set_id", "pos")),
    "xref_pg_member" -> (b.select(col("pg_uid"),
      col("provider_reference_id").as("npi")).na.drop()
      .dropDuplicates("pg_uid", "npi"), Seq("pg_uid", "npi")))

  /** Fact at the 13-field grain with deterministic fact_uid
    * (prod_etl/ETL_1.py:406-443). */
  def fact(b: DataFrame): DataFrame =
    b.select(
      factUid(col("state"), col("year_month"), col("payer_slug"),
        col("billing_class"), col("code_type"), col("billing_code"),
        col("pg_uid"), col("pos_set_id"), col("negotiated_type"),
        col("negotiation_arrangement"), col("expiration_date"),
        col("negotiated_rate"), col("provider_reference_id")).as("fact_uid"),
      col("state"), col("year_month"), col("payer_slug"),
      col("billing_class"), col("code_type"), col("billing_code").as("code"),
      col("pg_uid"), col("pos_set_id"), col("negotiated_type"),
      col("negotiation_arrangement"), col("negotiated_rate"),
      expirationSentinel(col("expiration_date")).as("expiration_date"),
      col("provider_reference_id").as("provider_group_id_raw"))
      // full-row distinct ≡ dedup-by-uid here (fact_uid is an md5 over
      // every other column's preimage) but plans as a sort-free
      // HashAggregate instead of a 13-string-first() SortAggregate —
      // see the star_fact_build comment in queries/Inventory.scala
      .distinct()

  /** J11 append-unique: write only new-keyed rows onto an existing
    * parquet dataset (prod_etl/ETL_1.py:359-398). The existing side is
    * read as a slim key projection — never the full payload. */
  def appendUnique(spark: SparkSession, df: DataFrame, path: String,
                   keys: Seq[String]): Unit = {
    val fresh =
      if (!exists(spark, path)) df.dropDuplicates(keys)
      else {
        val existingKeys = spark.read.parquet(path).select(keys.map(col): _*)
        df.dropDuplicates(keys)
          .join(existingKeys, keys, "left_anti")
      }
    fresh.write.mode(SaveMode.Append)
      .option("compression", "zstd").parquet(path)
  }

  /** J12 upsert-by-uid (prod_etl/ETL_1.py:450-498): same anti-join
    * shape, append-only because fact rows are immutable at their uid. */
  def upsertFact(spark: SparkSession, stage: DataFrame, path: String): Unit =
    appendUnique(spark, stage, path, Seq("fact_uid"))

  /** Small-file compaction for a hive-partitioned dataset: every
    * incremental append adds another part file per touched leaf, and
    * after enough batches the listing + per-file open cost dominates
    * reads (the reference's sharding guidance exists for the same
    * reason — Data_Schema.md:28-34). Rewrites the dataset clustered by
    * the partition columns — one writer per leaf, so each leaf ends up
    * with a single ~row-group-sized file — into `outPath`, which the
    * caller then atomically swaps in (S12's publish pattern). Writing
    * a fresh copy is deliberate: Spark forbids overwriting a path
    * that is being read, and in-place rewrites of a live hive layout
    * are unsafe without a snapshotting table format anyway. */
  def compactPartitions(spark: SparkSession, path: String, outPath: String,
                        partitionCols: Seq[String] = FactPartitionCols): Unit =
    writePartitionedFact(spark,
      spark.read.parquet(path).repartition(partitionCols.map(col): _*),
      outPath, partitionCols)

  /** The reference's gold-fact partition scheme — 5 levels, matching
    * its `state=/year_month=/payer_slug=/billing_class=/code_type=`
    * layout (prod_etl/notebook.py:385-405's read glob). Every level is
    * bounded-cardinality (geography × month × payer × 2 × 2), so the
    * directory count stays sane at 100 TB while the webapp's mandatory
    * state+year_month filters — and any deeper ones — prune at file
    * listing. */
  val FactPartitionCols: Seq[String] =
    Seq("state", "year_month", "payer_slug", "billing_class", "code_type")

  /** S13 hive-partitioned fact sink with dynamic partition overwrite
    * (prod_etl/notebook.py:275-348): only the partitions present in
    * `df` are rewritten; every other partition is untouched. */
  def writePartitionedFact(spark: SparkSession, df: DataFrame, path: String,
                           partitionCols: Seq[String] = FactPartitionCols): Unit =
    // Per-write option, not a session conf mutation: a session-level
    // partitionOverwriteMode=dynamic would silently change the semantics
    // of every later Overwrite write in the same session.
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .option("compression", "zstd")
      // 256 MB row groups, the reference's layout target
      // (prod_etl/notebook.py:30): bigger groups = fewer footer/page
      // boundaries per scan task and better zstd ratios on the wide
      // fact; still well under a task's split size at 100 TB.
      .option("parquet.block.size", (256L << 20).toString)
      .parquet(path)

  /** Optional post-build layout step: z-order WITHIN each hive leaf by
    * the probe columns the partition scheme cannot skip for. The 5
    * partition levels prune the webapp's mandatory filters
    * (state/year_month/payer/class/code_type) at the directory
    * listing, but its code/rate drill-downs
    * (webapp/staged_dashboard.py:95-310) still scan every file inside
    * the matched leaves — this step clusters each leaf by Morton order
    * over `cols` and publishes a per-leaf zone-map manifest
    * ([[graft.operators.Layout.zorderLeaves]]), so range probes skip
    * at FILE grain inside the leaf too. Leaves are rebuilt
    * independently (staging + swap per leaf); run after
    * [[writePartitionedFact]] / [[compactPartitions]], re-run after
    * heavy append eras. Returns the number of leaves rebuilt. */
  def zorderFactPartitions(spark: SparkSession, path: String,
                           cols: Seq[String], nFiles: Int = 8): Int =
    graft.operators.Layout.zorderLeaves(spark, path, cols, nFiles)

  /** Partition-lifecycle retention for the hive fact: drop every
    * `year_month=<v>` leaf strictly OLDER than the cutoff (YYYY-MM
    * compares lexicographically), across all states. Pure directory
    * operations — dropping a month at 100 TB is O(#partition dirs),
    * never a row rewrite, which is exactly why the fact partitions on
    * year_month in the first place. `execute=false` is the audit
    * mode: report what WOULD drop, touch nothing. Returns the dropped
    * (or would-drop) partition paths so the sweep is loggable — the
    * no-silent-deletes twin of the dedup family's observe metrics.
    * Emptied `state=` parents are cleaned so file listings don't
    * accumulate dead levels. */
  def retentionSweep(spark: SparkSession, path: String,
                     cutoffYearMonth: String,
                     execute: Boolean = true): Seq[String] = {
    if (!exists(spark, path)) return Nil
    val (fs, root) = graft.streaming.DedupStream.fsOf(spark, path)
    val dropped = for {
      st <- fs.listStatus(root).toSeq
      if st.isDirectory && st.getPath.getName.startsWith("state=")
      ym <- fs.listStatus(st.getPath).toSeq
      if ym.isDirectory && ym.getPath.getName.startsWith("year_month=")
      if ym.getPath.getName.stripPrefix("year_month=") < cutoffYearMonth
    } yield ym.getPath
    if (execute) {
      dropped.foreach(p => fs.delete(p, true))
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("state="))
        .filter(st => fs.listStatus(st.getPath).isEmpty)
        .foreach(st => fs.delete(st.getPath, true))
    }
    dropped.map(_.toString)
  }

  /** Full batch build (SURVEY §3.2): dims append-unique + fact upsert. */
  def runFull(spark: SparkSession, dir: String, outDir: String): Unit = {
    val b = base(spark, dir).cache()
    try {
      dims(b).foreach { case (name, (df, keys)) =>
        appendUnique(spark, df, s"$outDir/$name", keys)
      }
      upsertFact(spark, fact(b), s"$outDir/fact_rate")
    } finally b.unpersist()
  }

  /** Committed-data existence (see [[graft.FsUtils.committedExists]]):
    * crash residue does not count, or appendUnique's read-existing
    * branch would fail schema inference forever on a retry. */
  private def exists(spark: SparkSession, path: String): Boolean =
    graft.FsUtils.committedExists(spark, path)
}
