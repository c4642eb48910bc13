package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM smoke for the real deployment path — the string config
  * `spark.sql.extensions=graft.GraftExtensions` (a static conf, so it
  * only takes effect when the SparkContext starts, which is why the
  * suite-shared-session specs can't cover it). Run with:
  *
  *   sbt "Test/runMain graft.ExtensionsSmoke"
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val cos = spark.sql(
      """SELECT cosine_f32(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
        |""".stripMargin).head.getDouble(0)
    val sigLen = spark.sql("SELECT minhash_sig(array('a','b','c'))")
      .head.getSeq[Long](0).length
    assert(math.abs(cos - 1.0) < 1e-12, s"cosine_f32 wrong: $cos")
    assert(sigLen == graft.functions.MinHashSig.DefaultK,
      s"minhash_sig length wrong: $sigLen")
    println(s"EXTENSIONS-SMOKE-OK cosine=$cos sigLen=$sigLen")
    spark.stop()
  }
}
