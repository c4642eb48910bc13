package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants for the round-8 text operators over
  * ADVERSARIAL documents the fixture can't produce: empty texts,
  * punctuation-only texts, single tokens, giant repeated runs, digits,
  * and mixed junk. The oracles pin exact fixture values; these pin the
  * operators' structural laws on arbitrary input. */
class TrainingPropertySpec extends SparkSpec {

  /** Random "documents" with hostile shapes. */
  private def sample(n: Int): Seq[(Long, String, String, Long)] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "x1", "9", "zz")
    val gen = Gen.frequency(
      6 -> Gen.chooseNum(1, 60).flatMap(k =>
        Gen.listOfN(k, word).map(_.mkString(" "))),
      1 -> Gen.const(""),
      1 -> Gen.const("!!! ... ###"), // tokenizes to nothing
      1 -> Gen.const("single"),
      1 -> Gen.const(("dup " * 200).trim)) // giant repeated run
    var seed = Seed(11L)
    (0 until n).map { i =>
      val text = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (i.toLong, text, if (i % 3 == 0) "en" else "fr", text.length.toLong)
    }
  }

  private def docsDf(n: Int) = {
    import spark.implicits._
    sample(n).toDF("doc_id", "text", "lang", "n_chars")
  }

  private def tok(t: org.apache.spark.sql.Column) =
    filter(split(regexp_replace(lower(t), "[^a-z0-9 ]", " "), "\\s+"),
      v => length(v) > 0)

  test("index probe over hostile docs equals assembled-by-hand BM25 candidates") {
    val d = java.nio.file.Files.createTempDirectory("graft_prop_idx")
    d.toFile.deleteOnExit()
    val docs = docsDf(120).localCheckpoint()
    graft.operators.Retrieval.writeTextIndex(docs, "doc_id", "text",
      s"$d/idx")
    // membership law: every doc containing a term appears in its
    // posting list with the right tf; empty-token docs appear nowhere
    // but still count in the stats
    val posts = spark.read.parquet(s"$d/idx/postings")
      .filter(col("token") === "alpha")
      .select(col("doc_id"), col("tf")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs
      .select(col("doc_id"), size(filter(tok(col("text")),
        x => x === "alpha")).as("tf"))
      .filter(col("tf") > 0).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(posts == want, "posting list membership/tf law broken")
    val stats = spark.read.parquet(s"$d/idx/stats").head()
    assert(stats.getLong(0) == docs.count(),
      "zero-token docs must still count in n_docs")
  }

  test("chunking tiles every hostile doc; zero-token docs yield one empty chunk") {
    val docs = docsDf(150)
    docs.createOrReplaceTempView("prop_docs")
    val tk = tok(col("text"))
    val chunks = docs
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), col("tk"),
        floor(greatest(size(col("tk")) - 32 + 23, lit(0))
          .cast("double") / 24).cast("int").as("kmax"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0), col("kmax"))).as("k"))
      .select(col("doc_id"), (col("k") * 24 + 1).as("s"),
        least(col("k") * 24 + 32, size(col("tk"))).as("e"),
        size(col("tk")).as("n"))
    // last chunk reaches n (or the single empty chunk covers nothing)
    val byDoc = chunks.groupBy("doc_id", "n")
      .agg(max(col("e")).as("maxe"), min(col("s")).as("mins"),
        count(lit(1)).as("c"))
    assert(byDoc.filter(col("n") > 0 && col("maxe") =!= col("n"))
      .count() == 0, "a non-empty doc's chunks do not reach its end")
    assert(byDoc.filter(col("mins") =!= 1).count() == 0)
    assert(byDoc.filter(col("n") === 0 && col("c") =!= 1).count() == 0,
      "an empty doc must yield exactly one (empty) chunk")
  }

  test("trainer is invariant to partitioning on hostile docs") {
    val docs = docsDf(200)
    val f1 = graft.operators.Training.featuresOf(docs.repartition(1))
    val f7 = graft.operators.Training.featuresOf(docs.repartition(7))
    val (w1, l1, n1) = graft.operators.Training.gdStep(f1, Array.fill(4)(0.0))
    val (w7, l7, n7) = graft.operators.Training.gdStep(f7, Array.fill(4)(0.0))
    assert(n1 == n7 && n1 == 200)
    assert(l1 == l7, s"loss differs across partitionings: $l1 vs $l7")
    assert(w1.toSeq == w7.toSeq,
      s"weights differ across partitionings: ${w1.toSeq} vs ${w7.toSeq}")
  }

  test("cdc snapshot law on a random change log: last-writer wins, tombstones drop") {
    import spark.implicits._
    val gen = for {
      user <- Gen.chooseNum(0L, 30L)
      op <- Gen.frequency(4 -> Gen.oneOf("view", "purchase"),
        1 -> Gen.const("error"))
      v <- Gen.chooseNum(0, 1000)
    } yield (user, op, v / 100.0)
    var seed = Seed(13L)
    val log = (0 until 400).map { i =>
      val (u, o, v) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      (u, i.toLong, o, v)
    }
    val df = log.toDF("user_id", "version", "op", "value")
    val d = java.nio.file.Files.createTempDirectory("graft_prop_cdc")
    d.toFile.deleteOnExit()
    (0 to 3).foreach(i => graft.streaming.CdcStream.processBatch(
      df.filter(col("version") % 4 === i), i.toLong, s"$d/st"))
    val got = graft.streaming.CdcStream.snapshot(spark, s"$d/st")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // independent plain-Scala reference
    val want = log.groupBy(_._1).flatMap { case (u, rows) =>
      val last = rows.maxBy(_._2)
      if (last._3 == "error") None else Some(u -> (last._2, last._3))
    }
    assert(got == want, "cdc snapshot diverged from the scala reference")
  }
}
