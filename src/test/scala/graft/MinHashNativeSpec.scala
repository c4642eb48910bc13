package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The native minhash_sig kernel must produce exactly the HOF
  * formulation's signature values for every document. */
class MinHashNativeSpec extends SparkSpec {

  test("native minhash signatures == HOF minhash signatures") {
    val native = Dedup.minhashSignatures(spark, sf0001)
    val hof = Dedup.minhashSignaturesHof(spark, sf0001)
    assert(native.columns.sameElements(hof.columns))
    val n = native.count()
    assert(hof.count() == n && n > 500)
    // full-row equality: inner-join on all 17 columns keeps only rows
    // where every signature value matches
    val matched = native.join(hof, native.columns.toSeq).count()
    assert(matched == n, s"only $matched of $n signature rows identical")
  }
}
