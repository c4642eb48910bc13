package graft

import graft.operators.TextAnalysis

/** The native rolling_fp kernel must produce byte-identical
  * fingerprints to the composable HOF formulation on the full corpus —
  * including short (< K chars) and duplicate-hash documents. */
class RollingFpNativeSpec extends SparkSpec {

  test("native rolling_fp == HOF bottom-k gram-hash fingerprint") {
    val native = TextAnalysis.queries("text_fingerprint_rolling")(
      spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hof = TextAnalysis.rollingFingerprintHof(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native.keySet == hof.keySet)
    val diffs = native.keySet.filter(k => native(k) != hof(k))
    assert(diffs.isEmpty,
      s"kernel/HOF divergence on docs ${diffs.take(3)}: " +
        diffs.take(1).map(k => s"${native(k)} vs ${hof(k)}").mkString)
    assert(native.nonEmpty)
  }

  test("randomized parity: kernel == HOF on arbitrary unicode strings") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen: Gen[String] = Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(Gen.oneOf(" ", "\t", "\n", "ß", "é", "中", "文",
        "🦀" /* 🦀 surrogate pair */, "a", "0", "."))
        .map(_.mkString),
      1 -> Gen.const(""),
      1 -> Gen.const("        "), // whitespace-only → empty after norm
      1 -> Gen.alphaNumStr)
    val samples = Iterator.iterate((Seed(42L), List.empty[String])) {
      case (s, acc) =>
        (s.next, gen.pureApply(Gen.Parameters.default, s) :: acc)
    }.drop(200).next()._2.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    graft.GraftExtensions.registerAll(spark)
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val native = df.select(col("doc_id"), norm.as("norm"))
      .select(col("doc_id"), call_function("rolling_fp", col("norm")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val k = graft.functions.RollingFpKernel.K
    val bottom = graft.functions.RollingFpKernel.Bottom
    val hof = df.select(col("doc_id"), norm.as("norm"))
      .select(col("doc_id"),
        transform(sequence(lit(1), greatest(length(col("norm")) - (k - 1),
          lit(1))), i => col("norm").substr(i, lit(k))).as("grams"))
      .select(col("doc_id"), transform(col("grams"), g =>
        conv(substring(md5(g), 1, 8), 16, 10).cast("long")).as("hs"))
      .select(col("doc_id"),
        concat_ws("-", slice(array_sort(col("hs")), 1, bottom)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val diffs = native.keySet.filter(id => native(id) != hof(id))
    assert(diffs.isEmpty, s"divergence on inputs: " +
      diffs.take(3).map(id => samples.find(_._1 == id).get._2
        .take(40)).mkString("[", ", ", "]"))
  }

  test("kernel edge cases: short strings and whole-string gram") {
    import org.apache.spark.unsafe.types.UTF8String
    val fp = (s: String) =>
      graft.functions.RollingFpKernel.fingerprint(
        UTF8String.fromString(s)).toString
    // shorter than K: one whole-string gram → a single hash value
    assert(!fp("ab").contains("-"))
    assert(fp("ab") == fp("ab"))
    // exactly K chars: still one gram
    assert(!fp("abcdefgh").contains("-"))
    // K+1 chars: two grams → two joined values
    assert(fp("abcdefghi").count(_ == '-') == 1)
    // deterministic and edit-local: a suffix edit on a long string
    // keeps the fingerprints' shared prefix values intact only if the
    // bottom hashes come from the untouched region — just assert the
    // two are valid 4-part sketches and differ
    val a = fp("the quick brown fox jumps over the lazy dog " * 3)
    val b = fp("the quick brown fox jumps over the lazy cat " * 3)
    assert(a.count(_ == '-') == 3 && b.count(_ == '-') == 3)
  }
}
