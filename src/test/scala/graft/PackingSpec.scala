package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: the DuckDB oracle pins exact values on the fixture
  * corpus; these specs pin the packing invariants of the generic kernel
  * on a hand-built frame where the layout is checkable by eye. */
class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(Long, String, Long)], budget: Int) = {
    import spark.implicits._
    Packing.packPrepared(rows.toDF("id", "grp", "n_tok"),
      Seq("grp"), "id", "n_tok", budget)
  }

  test("token stream is contiguous within a group: start = sum of predecessors") {
    val got = pack(Seq((1L, "g", 10L), (2L, "g", 50L), (3L, "g", 7L),
      (10L, "h", 100L), (11L, "h", 1L)), budget = 64)
      .select("id", "token_start", "seq_idx", "seq_offset", "n_seqs_spanned")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(got(1L) == ((0L, 0L, 0L, 1)))
    assert(got(2L) == ((10L, 0L, 10L, 1)))   // 10+50=60 ≤ 64: stays in seq 0
    assert(got(3L) == ((60L, 0L, 60L, 2)))   // 60..66 straddles the boundary
    assert(got(10L) == ((0L, 0L, 0L, 2)))    // 100 tokens spans seqs 0-1
    assert(got(11L) == ((100L, 1L, 36L, 1)))
  }

  test("groups pack independently and seq_uid is group-scoped") {
    val df = pack(Seq((1L, "a", 5L), (2L, "a", 5L), (1L, "b", 5L)), budget = 8)
    val uids = df.select("grp", "seq_uid").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(uids.size == 2 && uids("a") != uids("b"))
  }

  test("fixture packing accounts for every token exactly once per group") {
    val packed = SparkEntry.queries("pack_sequences")(spark, sf0001)
    // last doc's start + count == group total: nothing lost or repeated
    val byGroup = packed.groupBy("source", "pack_group")
      .agg(max(col("token_start") + col("n_tokens")).as("end"),
        sum("n_tokens").as("total"))
      .filter(col("end") =!= col("total"))
    assert(byGroup.count() == 0)
    // stats agree with the packed frame on totals
    val stats = SparkEntry.queries("pack_stats")(spark, sf0001)
    val lhs = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    val rhs = stats.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(lhs == rhs)
    // share sums to ~1
    val share = stats.agg(sum("token_share")).collect()(0).getDouble(0)
    assert(math.abs(share - 1.0) < 1e-3)
  }

  test("curriculum shards: rank is a permutation, shards fill in order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"))
    val n = docs.count()
    val got = Packing.curriculumShards(docs, "n_chars", "doc_id",
      shardSize = 64)
    // ranks are exactly 1..n
    assert(got.agg(countDistinct("rank")).head().getLong(0) == n)
    assert(got.agg(min("rank")).head().getLong(0) == 1L)
    assert(got.agg(max("rank")).head().getLong(0) == n)
    // every shard is full except possibly the last
    val sizes = got.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    sizes.dropRight(1).foreach { case (s, c) =>
      assert(c == 64L, s"shard $s has $c docs") }
    // curriculum property: difficulty never decreases across shard
    // boundaries (max of shard i <= min of shard i+1)
    val bounds = got.groupBy("shard")
      .agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, _, mxA), (sb, mnB, _)) =>
        assert(mxA <= mnB, s"shard $sb breaks the curriculum order")
      case _ =>
    }
  }
}
