package graft

import org.apache.spark.sql.functions._
import graft.operators.Export

/** Sharded training export: determinism of membership/order and the
  * writer's on-disk layout. The DuckDB oracle pins the stats query's
  * exact values; these specs pin what SQL can't see — the files. */
class ExportSpec extends SparkSpec {

  test("shard stats: complete cover, conserved counts, deterministic") {
    val a = Export.queries("export_shard_stats")(spark, sf0001).collect()
    assert(a.map(_.getLong(0)).toSet == (0L until Export.NShards).toSet,
      "not every shard populated at sf0.001")
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(a.map(_.getLong(1)).sum == total, "shard counts don't conserve")
    val b = Export.queries("export_shard_stats")(spark, sf0001).collect()
    assert(a.map(r => r.getLong(0) -> r.getString(3)).toMap ==
      b.map(r => r.getLong(0) -> r.getString(3)).toMap,
      "order fingerprint not deterministic across runs")
  }

  test("writer: hive layout, correct membership, stable in-file order") {
    val out = java.nio.file.Files.createTempDirectory("graft_export")
      .toString + "/shards"
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "n_chars")
    Export.exportShards(docs, "doc_id", out)

    // every shard dir exists and holds the right members in the right order
    val expected = Export
      .assignShards(docs, "doc_id", Export.NShards, Export.Seed)
      .select("doc_id", "shuffle_h", "shard").collect()
      .groupBy(_.getLong(2))
      .map { case (s, rs) =>
        s -> rs.map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2).toSeq
      }
    (0L until Export.NShards).foreach { s =>
      val dir = s"$out/shard=$s"
      assert(new java.io.File(dir).isDirectory, s"missing dir shard=$s")
      // single unsplit file per shard here → read order == write order
      val got = spark.read.parquet(dir).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected(s), s"shard $s order/membership drifted")
    }

    // re-export is byte-stable at the row level: same members, same order
    val out2 = java.nio.file.Files.createTempDirectory("graft_export2")
      .toString + "/shards"
    Export.exportShards(docs, "doc_id", out2)
    (0L until Export.NShards).foreach { s =>
      val a = spark.read.parquet(s"$out/shard=$s").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      val b = spark.read.parquet(s"$out2/shard=$s").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(a == b, s"shard $s not reproducible")
    }
  }

  test("maxRecordsPerFile splits files without breaking shard order") {
    val out = java.nio.file.Files.createTempDirectory("graft_export3")
      .toString + "/shards"
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "n_chars")
    Export.exportShards(docs, "doc_id", out, maxRecordsPerFile = 7L)
    val dir = new java.io.File(s"$out/shard=0")
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.length > 1, "expected multiple files under the cap")
    // part files sort lexicographically in write order; concatenating
    // their rows must reproduce the (shuffle_h, doc_id) shard order
    val rows = parts.sortBy(_.getName).flatMap { f =>
      spark.read.parquet(f.getAbsolutePath).select("doc_id")
        .collect().map(_.getLong(0))
    }.toSeq
    val expected = Export
      .assignShards(docs, "doc_id", Export.NShards, Export.Seed)
      .filter(col("shard") === 0)
      .orderBy("shuffle_h", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(rows == expected, "split files broke the shard order")
  }
}
