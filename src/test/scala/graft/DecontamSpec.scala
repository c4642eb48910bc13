package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Benchmark decontamination: the DuckDB oracle pins exact values for
  * the fixture query; these specs pin the generic operator's semantics
  * on a synthetic corpus with known contamination. */
class DecontamSpec extends SparkSpec {

  test("flagContaminated finds exactly the docs sharing an 8-gram") {
    import spark.implicits._
    val evalItem = "alpha bravo charlie delta echo foxtrot golf hotel"
    val corpus = Seq(
      // contains the full eval 8-gram mid-document
      (1L, s"intro words then $evalItem and a tail"),
      // shares only 7 consecutive words with the eval item
      (2L, "alpha bravo charlie delta echo foxtrot golf INDIA zulu"),
      // unrelated
      (3L, "one two three four five six seven eight nine ten"),
      // too short to have any 8-gram
      (4L, "just a few words")
    ).toDF("id", "body")
    val benchmark = Seq(evalItem).toDF("q")
    val got = Decontaminate
      .flagContaminated(corpus, "id", "body", benchmark, "q")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(1L)._3 == 1 && got(1L)._2 >= 1)
    assert(got(2L) == ((2, 0L, 0)))    // 9 tokens → 2 grams, no hit
    assert(got(3L)._3 == 0)
    assert(got(4L) == ((0, 0L, 0)))    // no grams at all
  }

  test("normalization: case and punctuation do not hide contamination") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Alpha, bravo; CHARLIE delta! echo foxtrot golf hotel?")
    ).toDF("id", "body")
    val benchmark = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel").toDF("q")
    val got = Decontaminate
      .flagContaminated(corpus, "id", "body", benchmark, "q").collect()
    assert(got.head.getInt(3) == 1)
  }

  test("semantic: benchmark self-flags at 1.0, witnesses valid, flag=sign") {
    val rows = Decontaminate.queries("decontam_semantic")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val benchIds = rows.map(_._1).filter(i => i % 13 == 4 && i < 130).toSet
    assert(benchIds.nonEmpty, "fixture has no benchmark vectors")
    rows.foreach { case (id, cos, witness, flag) =>
      assert(cos <= 1.0001 && cos >= -1.0001, s"vec $id cosine $cos")
      assert(benchIds.contains(witness),
        s"vec $id witness $witness not a benchmark id")
      if (id % 13 == 4 && id < 130) {
        assert(cos == 1.0, s"benchmark vec $id max_cosine $cos != 1.0")
        assert(witness == id, s"benchmark vec $id nearest is $witness")
        assert(flag == 1, s"benchmark vec $id not flagged")
      }
    }
    // random synthetic vectors are near-orthogonal: non-benchmark rows
    // must overwhelmingly sit far below tau
    val clean = rows.filterNot(r => benchIds.contains(r._1))
    assert(clean.count(_._4 == 0) == clean.length,
      "non-benchmark vectors tripped the 0.95 threshold")
  }

  test("fixture query: every benchmark doc with >= 8 tokens self-flags") {
    val rows = Decontaminate.queries("decontam_ngram")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.filter(t => t._1 % 17 == 3 && t._2 > 0).foreach { t =>
      assert(t._4 == 1, s"benchmark doc ${t._1} not flagged")
      assert(t._3 == t._2.toLong, s"benchmark doc ${t._1}: every gram hits")
    }
    // flag agrees with the hit count everywhere
    rows.foreach(t => assert((t._4 == 1) == (t._3 > 0)))
  }
}
