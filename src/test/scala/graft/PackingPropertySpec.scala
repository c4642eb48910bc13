package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Packing

/** Randomized packing invariants checked against an independent
  * plain-Scala prefix-sum reference: for ANY group layout, token
  * counts, and budget, the packed coordinates must describe one
  * contiguous token stream per group with correct chunk arithmetic. */
class PackingPropertySpec extends SparkSpec {

  private def sample(n: Int): Seq[(Long, String, Long)] = {
    val gen = for {
      grp <- Gen.oneOf("g0", "g1", "g2", "g3")
      nTok <- Gen.frequency(5 -> Gen.choose(1L, 400L), 1 -> Gen.const(0L),
        1 -> Gen.choose(1000L, 5000L)) // zero-token and giant docs included
    } yield (grp, nTok)
    var seed = Seed(7L)
    (0 until n).map { i =>
      val (grp, nTok) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, grp, nTok)
    }
  }

  test("packed coordinates match the prefix-sum reference for random corpora") {
    import spark.implicits._
    val docs = sample(300)
    val budget = 137 // deliberately not a power of two
    val got = Packing.packPrepared(
        docs.toDF("id", "grp", "n_tok"), Seq("grp"), "id", "n_tok", budget)
      .select("id", "token_start", "seq_idx", "seq_offset", "n_seqs_spanned")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    // independent reference: sort by id per group, running prefix sums
    val expected = docs.groupBy(_._2).flatMap { case (_, ds) =>
      var start = 0L
      ds.sortBy(_._1).map { case (id, _, nTok) =>
        val s = start
        start += nTok
        val seqIdx = s / budget
        val lastTok = s + math.max(nTok, 1L) - 1
        id -> (s, seqIdx, s % budget, (lastTok / budget - seqIdx + 1).toInt)
      }
    }
    assert(got.size == expected.size)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
    }
  }

  test("seq_uid changes exactly at chunk boundaries within a group") {
    import spark.implicits._
    val docs = sample(300)
    val budget = 137
    val rows = Packing.packPrepared(
        docs.toDF("id", "grp", "n_tok"), Seq("grp"), "id", "n_tok", budget)
      .select("grp", "seq_idx", "seq_uid").distinct().collect()
    // one uid per (grp, seq_idx), and distinct across groups
    val byPair = rows.map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
    assert(byPair.length == byPair.toMap.size)
    assert(byPair.map(_._2).distinct.length == byPair.length)
  }
}
