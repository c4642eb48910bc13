package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.StarSchemaBuilder

/** Write-side semantics: append-unique, upsert idempotence at the file
  * level, and the hive-partitioned fact sink with dynamic partition
  * overwrite (SURVEY §2.1 S11-S14, §2.3 J11/J12). */
class EtlSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_etl").toString

  test("runFull builds dims + fact; second run adds nothing (idempotent)") {
    val out = tmp()
    StarSchemaBuilder.runFull(spark, sf0001, out)
    val counts1 = Seq("dim_code", "dim_payer", "dim_provider_group",
      "dim_pos_set", "xref_pos", "xref_pg_member", "fact_rate")
      .map(t => t -> spark.read.parquet(s"$out/$t").count()).toMap
    assert(counts1.values.forall(_ > 0), counts1.toString)
    assert(counts1("dim_payer") == 5) // payer_0..payer_4 by construction
    // fact uids unique
    val fact = spark.read.parquet(s"$out/fact_rate")
    assert(fact.select("fact_uid").distinct().count() == counts1("fact_rate"))

    StarSchemaBuilder.runFull(spark, sf0001, out) // same batch again
    val counts2 = counts1.keys
      .map(t => t -> spark.read.parquet(s"$out/$t").count()).toMap
    assert(counts2 == counts1, "second identical run must be a no-op")
  }

  test("appendUnique appends only rows with unseen keys") {
    import spark.implicits._
    val out = tmp() + "/t"
    StarSchemaBuilder.appendUnique(spark,
      Seq(("a", 1), ("b", 2)).toDF("k", "v"), out, Seq("k"))
    StarSchemaBuilder.appendUnique(spark,
      Seq(("b", 99), ("c", 3)).toDF("k", "v"), out, Seq("k"))
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows == Map("a" -> 1, "b" -> 2, "c" -> 3),
      "existing key b must keep its first value")
  }

  test("partitioned fact sink: 5-level layout + dynamic partition overwrite") {
    val out = tmp() + "/fact"
    val fact = StarSchemaBuilder.fact(StarSchemaBuilder.base(spark, sf0001))
    StarSchemaBuilder.writePartitionedFact(spark, fact, out)
    val all = spark.read.parquet(out)
    assert(all.count() == fact.count())
    // the reference's 5-level hive layout: state=/year_month=/payer_slug=/
    // billing_class=/code_type=
    val top = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(top.exists(_.getName.startsWith("state=")),
      top.map(_.getName).mkString(","))
    def firstDir(f: java.io.File) =
      f.listFiles().filter(_.isDirectory).head
    val leafPath = Iterator.iterate(top.filter(_.getName.startsWith("state="))
      .head)(firstDir).drop(4).next()
    assert(leafPath.getName.startsWith("code_type="),
      s"expected 5 partition levels, leaf was ${leafPath.getName}")

    // overwrite ONE leaf partition with a single row; others intact
    val slice = {
      val r = fact
        .select(StarSchemaBuilder.FactPartitionCols.map(col): _*).head
      StarSchemaBuilder.FactPartitionCols.zipWithIndex
        .map { case (c, i) => col(c) === r.getString(i) }.reduce(_ && _)
    }
    val onePart = fact.filter(slice).limit(1)
    val before = all.count()
    val beforeInPart = fact.filter(slice).count()
    StarSchemaBuilder.writePartitionedFact(spark, onePart, out)
    val after = spark.read.parquet(out).count()
    assert(after == before - beforeInPart + 1,
      "only the rewritten leaf partition may change")
  }

  test("compaction: fragmented leaves collapse to one file, rows equal") {
    val base = tmp() + "/frag"
    val out = tmp() + "/compact"
    // three appends → ≥3 part files in every touched leaf
    val df = StarSchemaBuilder.base(spark, sf0001)
    val slice = df.limit(300)
    (1 to 3).foreach { _ =>
      slice.write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy(StarSchemaBuilder.FactPartitionCols: _*)
        .parquet(base)
    }
    def leafCounts(root: String): Map[String, Int] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root))
        .filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath).map { case (k, v) => k -> v.size }
    }
    assert(leafCounts(base).values.forall(_ >= 3), "setup must fragment")
    StarSchemaBuilder.compactPartitions(spark, base, out)
    assert(leafCounts(out).values.forall(_ == 1),
      s"compacted leaves must hold exactly one file: ${leafCounts(out).filter(_._2 > 1).take(3)}")
    // byte-equivalent rowset
    val a = spark.read.parquet(base).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val b = spark.read.parquet(out).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(a.sameElements(b))
  }

  test("retention sweep drops only pre-cutoff months, audit mode touches nothing") {
    val out = tmp() + "/fact"
    val fact = StarSchemaBuilder.fact(StarSchemaBuilder.base(spark, sf0001))
    StarSchemaBuilder.writePartitionedFact(spark, fact, out)
    val months = spark.read.parquet(out).select("year_month")
      .distinct().collect().map(_.getString(0)).sorted
    assert(months.length >= 2, "fixture needs at least two months")
    val cutoff = months.last // drop everything strictly before the newest
    val before = spark.read.parquet(out).count()
    val oldRows = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("year_month") < cutoff)
      .count()
    // audit mode: reports, deletes nothing
    val wouldDrop = StarSchemaBuilder.retentionSweep(spark, out, cutoff,
      execute = false)
    assert(wouldDrop.nonEmpty)
    assert(spark.read.parquet(out).count() == before,
      "dry-run sweep must not delete")
    // execute: pre-cutoff months gone, newest month intact, row-exact
    val dropped = StarSchemaBuilder.retentionSweep(spark, out, cutoff)
    assert(dropped.toSet == wouldDrop.toSet)
    val after = spark.read.parquet(out)
    assert(after.count() == before - oldRows)
    assert(after.select("year_month").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(cutoff),
      "only the cutoff month should survive")
  }

  test("partition pruning: state+year_month filter reads one partition") {
    val out = tmp() + "/fact"
    val fact = StarSchemaBuilder.fact(StarSchemaBuilder.base(spark, sf0001))
    StarSchemaBuilder.writePartitionedFact(spark, fact, out)
    val r = fact.select("state", "year_month").head
    val pruned = spark.read.parquet(out)
      .filter(col("state") === r.getString(0) &&
        col("year_month") === r.getString(1))
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters"), scan.take(500))
    assert(pruned.count() > 0)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // The 100 TB shape: the fact is hive-partitioned on state, the
    // filter arrives on a DIM attribute (here a state group), so the
    // partition list is only known at runtime — static pruning can't
    // apply, dynamic partition pruning must inject the dim's state set
    // into the fact scan's PartitionFilters via the reused broadcast.
    val out = tmp() + "/fact"
    val fact = StarSchemaBuilder.fact(StarSchemaBuilder.base(spark, sf0001))
    StarSchemaBuilder.writePartitionedFact(spark, fact, out)
    val states = fact.select("state").distinct()
      .collect().map(_.getString(0)).sorted
    assert(states.length >= 2, "fixture needs at least two states")
    import spark.implicits._
    // the dim must be file-backed: a LocalRelation folds the grp filter
    // into its rows, and the pruning rule only fires on a join side
    // that carries a real selective Filter
    val dimPath = tmp() + "/dim_state"
    states.zipWithIndex.map { case (st, i) => (st, i % 2) }.toSeq
      .toDF("state", "grp").write.parquet(dimPath)
    val q = spark.read.parquet(out)
      .join(spark.read.parquet(dimPath).filter(col("grp") === 0),
        Seq("state"))
      .groupBy("state").count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan must carry a runtime pruning filter:\n" + plan.take(2000))
    // correctness: exactly the grp-0 states survive
    val got = q.collect().map(_.getString(0)).sorted.toSeq
    val want = states.zipWithIndex.collect { case (st, i) if i % 2 == 0 => st }
    assert(got == want.sorted.toSeq, s"got $got want ${want.toSeq}")
  }

  test("evolveDim: backfill + backup, rerun no-op, crashed swap heals") {
    import graft.etl.EnrichmentDims
    val dim = s"${tmp()}/dim_npi"
    EnrichmentDims.dimNpi(Roles.providers(spark, sf0001))
      .drop("nppes_fetched", "nppes_fetch_date")
      .write.parquet(dim)
    val n = spark.read.parquet(dim).count()
    // migrate: both columns added with the bulk backfill, backup kept
    assert(EnrichmentDims.evolveDim(spark, dim, Seq(
      "nppes_fetched" -> lit(true),
      "nppes_fetch_date" -> lit(null).cast("string"))))
    val migrated = spark.read.parquet(dim)
    assert(migrated.count() == n)
    assert(migrated.columns.contains("nppes_fetched") &&
      migrated.columns.contains("nppes_fetch_date"))
    assert(migrated.filter(col("nppes_fetched")).count() == n)
    val backup = spark.read.parquet(s"$dim.backup")
    assert(backup.count() == n &&
      !backup.columns.contains("nppes_fetched"),
      "backup must be the pre-migration dim")
    // rerun — even with a contradictory backfill — is a no-op
    assert(!EnrichmentDims.evolveDim(spark, dim, Seq(
      "nppes_fetched" -> lit(false))))
    assert(spark.read.parquet(dim).filter(col("nppes_fetched")).count() == n)
    // crash between the swap's two renames: the dim dir is displaced
    // and never promoted back — the next maintenance call heals it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(dim),
      new org.apache.hadoop.fs.Path(s"$dim.old")))
    assert(EnrichmentDims.evolveDim(spark, dim,
      Seq("schema_rev" -> lit(2)), backup = false))
    val healed = spark.read.parquet(dim)
    assert(healed.count() == n && healed.columns.contains("schema_rev"),
      "recovery did not restore the displaced dim before migrating")
  }

  test("repairFetchFlags resets placeholder rows from data presence") {
    import graft.etl.EnrichmentDims
    val dim = s"${tmp()}/dim_npi"
    val k = col("npi").cast("bigint")
    val keyFields = Set("status", "organization_name", "first_name",
      "last_name", "primary_taxonomy_code")
    val full = EnrichmentDims.dimNpi(Roles.providers(spark, sf0001))
    full.select(full.columns.map { c =>
        if (keyFields(c))
          when(k % 3 === 0, lit(null).cast("string")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
      .write.parquet(dim)
    EnrichmentDims.repairFetchFlags(spark, dim)
    val repaired = spark.read.parquet(dim)
    assert(repaired.filter(col("nppes_fetched") &&
      col("npi").cast("bigint") % 3 === 0).count() == 0,
      "placeholder rows must be unfetched")
    assert(repaired.filter(!col("nppes_fetched") &&
      col("npi").cast("bigint") % 3 =!= 0).count() == 0,
      "rows with a payload must stay fetched")
  }
}
