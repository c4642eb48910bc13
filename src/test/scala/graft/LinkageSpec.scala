package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

/** Fuzzy record linkage: recall on the injected-typo fixture, the
  * deterministic tie-break, hot-token-cap semantics + telemetry, and
  * the plan shape (broadcast master, banded levenshtein). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def master = Seq(
    (1L, "acme widget co"),
    (2L, "acme widget corp"),
    (3L, "globex ring supply"),
    (4L, "initech gear works"),
    (5L, "acme widget co") // duplicate display name, higher id
  ).toDF("master_id", "master_name")

  test("links every single-typo variant to a best master at the true distance") {
    val out = Linkage.queries("link_fuzzy_match")(spark, sf0001)
      .select("dirty_id", "distance").collect()
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every injected variant (two families x parts 0..399 of sf0.001's
    // 200 parts = 400 dirty rows) must link: the intact second token
    // always survives the first-token typo, so blocking cannot miss
    val n = spark.read.parquet(s"$sf0001/part.parquet")
      .filter(col("p_partkey") < 400).count()
    assert(byId.size == 2 * n, s"expected ${2 * n} linked, got ${byId.size}")
    // delete family: distance exactly 1 unless an even-closer master
    // name exists (duplicate names make 0 possible) — never more
    byId.filter(_._1 < 200000).values.foreach(d => assert(d <= 1))
    // transposition family: two substitutions, distance <= 2
    byId.filter(_._1 >= 200000).values.foreach(d => assert(d <= 2))
    // best-match optimality: the found distance never exceeds the
    // distance back to the TRUE master (the variant's source row)
    val parts = spark.read.parquet(s"$sf0001/part.parquet").select(
      col("p_partkey").as("tid"),
      regexp_replace(lower(trim(col("p_name"))), "\\s+", " ").as("true_name"))
    val viol = Linkage.queries("link_fuzzy_match")(spark, sf0001)
      .withColumn("tid", col("dirty_id") % 100000)
      .join(parts, "tid")
      .filter(levenshtein(col("dirty_name"), col("true_name"))
        < col("distance")).count()
    assert(viol == 0, s"$viol dirty rows matched worse than their true master")
  }

  test("tie-break is (distance, master_id): duplicate master names resolve low") {
    val dirty = Seq((10L, "acme widget co")).toDF("dirty_id", "dirty_name")
    val out = Linkage.fuzzyLink(master, dirty).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("master_id") == 1L) // not the id-5 duplicate
    assert(out.head.getAs[Int]("distance") == 0)
  }

  test("unlinked dirty records are absent, not null-matched") {
    val dirty = Seq((20L, "zzz qqq")).toDF("dirty_id", "dirty_name")
    assert(Linkage.fuzzyLink(master, dirty).isEmpty)
  }

  test("hot-token cap drops stopword blocks and reports them via observe") {
    // 'acme'/'widget' blocks have 3 masters; cap at 2 kills both, so a
    // dirty name reachable ONLY through those tokens goes unlinked
    val dirty = Seq((30L, "acme widget")).toDF("dirty_id", "dirty_name")
    val out = Linkage.fuzzyLink(master, dirty, maxBlock = 2,
      observeName = Some("link_cap"))
    assert(out.collect().isEmpty)
    // the cap was observed, not silent: 2 dropped tokens, 6 block rows
    val row = graft.plans.ObservedMetrics.of(out, "link_cap").get
    assert(row.getAs[Long]("dropped_tokens") == 2L, row.toString)
    assert(row.getAs[Long]("dropped_block_rows") == 6L, row.toString)
  }

  test("plan: master side broadcast, no UDFs, levenshtein is the banded form") {
    val dirty = Seq((40L, "globex ring suply")).toDF("dirty_id", "dirty_name")
    val df = Linkage.fuzzyLink(master, dirty)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"master token join should broadcast:\n$physical")
    assert(!physical.contains("BatchEvalPython") && !physical.contains("UDF"))
    // threshold arg present => banded DP, not full O(len^2)
    val expr = df.queryExecution.analyzed.toString
    assert(expr.toLowerCase.contains("levenshtein"))
    assert(df.collect().head.getAs[Long]("master_id") == 3L)
  }

  test("streaming linkage: batches compose, replay no-op, master refresh seen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_linkstream")
      .toString
    val masterPath = s"$dir/master"
    val linksPath = s"$dir/links"
    master.write.parquet(masterPath)
    val b0 = Seq((10L, "acme widget co"), (11L, "globex ring suply"))
      .toDF("dirty_id", "dirty_name")
    val b1 = Seq((12L, "initech gear work"), (13L, "zzz qqq"))
      .toDF("dirty_id", "dirty_name")
    graft.streaming.LinkageStream.processBatch(b0, 0L, masterPath, linksPath)
    graft.streaming.LinkageStream.processBatch(b1, 1L, masterPath, linksPath)
    def readLinks() = spark.read.parquet(linksPath)
      .select("dirty_id", "master_id", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val twoBatch = readLinks()
    // batches compose == one-shot full link (stateless per record)
    val oneShot = graft.operators.Linkage
      .fuzzyLink(master, b0.unionByName(b1))
      .select("dirty_id", "master_id", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(twoBatch.sameElements(oneShot))
    // the unlinked residue is a real sink, not a silent drop
    val unlinked = spark.read
      .parquet(graft.streaming.LinkageStream.unlinkedPathOf(linksPath))
      .select("dirty_id").collect().map(_.getLong(0)).toSet
    assert(unlinked == Set(13L), s"residue $unlinked")
    // replay of batch 1 rewrites its own partition only — a no-op
    graft.streaming.LinkageStream.processBatch(b1, 1L, masterPath, linksPath)
    assert(readLinks().sameElements(twoBatch))
    // master upsert between batches is visible to the NEXT batch
    Seq((6L, "hooli stack supply")).toDF("master_id", "master_name")
      .write.mode("append").parquet(masterPath)
    val b2 = Seq((14L, "hooli stack suply")).toDF("dirty_id", "dirty_name")
    graft.streaming.LinkageStream.processBatch(b2, 2L, masterPath, linksPath)
    val m14 = spark.read.parquet(linksPath)
      .filter(col("dirty_id") === 14L).select("master_id")
      .collect().map(_.getLong(0)).toSeq
    assert(m14 == Seq(6L), s"batch 2 should see the refreshed master: $m14")
  }

  test("length pre-filter never drops a within-threshold pair") {
    // delete shortens by 1, transpose preserves length: both inside
    // the |len diff| <= maxDist guard by construction; a 3-char gap
    // is correctly unreachable at maxDist=2
    val dirty = Seq((50L, "globex ring supplyabc")).toDF("dirty_id", "dirty_name")
    assert(Linkage.fuzzyLink(master, dirty).isEmpty)
  }
}
