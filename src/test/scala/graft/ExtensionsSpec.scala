package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path:
  * a session built with only that config (no Scala imports, no manual
  * registration) must resolve the native kernels from SQL text, and
  * the injected functions must compute the same values as the
  * session-registered path the query packs use. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions-built session resolves the kernels from SQL") {
    val base = spark // materialize the shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext's conf at startup; with the suite-shared context
    // already running, the string-config path can't activate here.
    // `withExtensions` drives the identical inject logic (getOrCreate
    // calls the same GraftExtensions.apply), so this covers everything
    // but Spark's own class-name reflection.
    val viaConf = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate() // new session state over the same SparkContext
    try {
      val cos = viaConf.sql(
        """SELECT cosine_f32(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
          |""".stripMargin).head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)

      val orthogonal = viaConf.sql(
        """SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT)))
          |""".stripMargin).head.getDouble(0)
      assert(math.abs(orthogonal) < 1e-12)

      val sig = viaConf.sql("SELECT minhash_sig(array('a','b','c','d','e'))")
        .head.getSeq[Long](0)
      assert(sig.length == graft.functions.MinHashSig.DefaultK)

      // subword_encode resolves via SQL text with an array-literal
      // vocab (the foldable-table path) through the extensions hook
      val sw = viaConf.sql(
        "SELECT subword_encode('customerjoin', array('customer', 'join'))")
        .head.getSeq[String](0)
      assert(sw == Seq("customer", "join"))

      // bloom machinery: build over SQL, probe from SQL — and the
      // membership law that makes the prefilter pattern sound: every
      // inserted value MUST probe true (no false negatives, ever)
      val bf = viaConf.sql(
        """SELECT bloom_build(v, CAST(64 AS BIGINT), CAST(4096 AS BIGINT))
          |FROM (SELECT explode(sequence(1, 50)) AS v)""".stripMargin)
        .head.getAs[Array[Byte]](0)
      assert(bf != null && bf.nonEmpty)
      import org.apache.spark.sql.functions.{call_function, col, explode,
        lit, sequence, sum, when}
      val probed = viaConf.range(1)
        .select(explode(sequence(lit(1), lit(50))).as("v"))
        .select(when(call_function("bloom_might_contain", lit(bf), col("v")),
          1).otherwise(0).as("hit"))
        .agg(sum(col("hit"))).head.getLong(0)
      assert(probed == 50L, "bloom false negative: a member probed false")

      // identical values through the session-scoped registration path
      graft.GraftExtensions.registerAll(base)
      val sigBase = base.sql("SELECT minhash_sig(array('a','b','c','d','e'))")
        .head.getSeq[Long](0)
      assert(sig == sigBase,
        "extensions-injected and session-registered minhash_sig diverge")
    } finally {
      // viaConf shares the JVM-wide SparkContext — never stop() it;
      // just restore the shared session for subsequent suites.
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
