package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.NormExprs._

/** Edge-case corpus from FIXTURES.md §6 (semantics cited to the
  * reference in NormExprs' Scaladoc). */
class NormExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("normZip: digits-first-5, zfill, null/empty (main.py:453-456)") {
    assert(one(normZip(lit("30309-1234"))) == "30309")
    assert(one(normZip(lit("309"))) == "00309")
    assert(one(normZip(lit("abc"))) == null)
    assert(one(normZip(lit(null).cast("string"))) == null)
    assert(one(normZip(lit(" 12345-6789 "))) == "12345")
  }

  test("normalizeYymm: effective regex semantics (prod_etl/ETL_1.py:95-107)") {
    assert(one(normalizeYymm(lit("2025-08-15"))) == "2025-08")
    assert(one(normalizeYymm(lit("2025/08"))) == "2025-08")
    // bare yyyymmdd has no [-/] separator → falls to "" like the reference
    assert(one(normalizeYymm(lit("20250815"))) == "")
    assert(one(normalizeYymm(lit("garbage"))) == "")
    assert(one(normalizeYymm(lit(null).cast("string"))) == "")
  }

  test("slugify: lower, collapse non-alnum, strip edges (ETL_1.py:79-84)") {
    assert(one(slugify(lit("Aetna Health Inc."))) == "aetna_health_inc")
    assert(one(slugify(lit("--A  B--"))) == "a_b")
    assert(one(slugify(lit("ABC"), "-")) == "abc")
    assert(one(slugify(lit(null).cast("string"))) == "")
  }

  test("phoneClean: digits or null (utils_nppes.py:70-74)") {
    assert(one(phoneClean(lit("(404) 555-1234"))) == "4045551234")
    assert(one(phoneClean(lit("none"))) == null)
    assert(one(phoneClean(lit(null).cast("string"))) == null)
  }

  test("posMembers corpus (prod_etl/notebook.py:48-62 shapes)") {
    def members(s: String): Seq[String] =
      one(posMembers(lit(s))).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(members("""["02","11"]""") == Seq("02", "11"))
    assert(members("[]") == Seq())
    assert(members("11,22") == Seq("11", "22"))
    assert(members("02; 11 |31") == Seq("02", "11", "31"))
    // single-quoted "JSON" is rejected by json.loads → split path
    assert(members("['n','u','l']") == Seq("'l']", "'u'", "['n'"))
    assert(members(null) == Seq())
  }

  test("posSetId: md5('none') sentinel for empty (ETL_1.py:148-165)") {
    val none = one(posSetId(posMembers(lit(null).cast("string"))))
    assert(none == "334c4a4c42fdb79d7ebc3e73b517e6f8") // md5("none")
    val ab = one(posSetId(posMembers(lit("""["11","02"]"""))))
    val ba = one(posSetId(posMembers(lit("02;11"))))
    assert(ab == ba, "order-insensitive after sort")
  }

  test("uid: null→'' coercion and rate 4-decimal stability (ETL_1.py:87-88,179-183)") {
    val withNull = one(uid(lit("a"), lit(null).cast("string"), lit("b")))
    val withEmpty = one(uid(lit("a"), lit(""), lit("b")))
    assert(withNull == withEmpty, "_co(None) == ''")
    assert(one(rate4(lit(100.0))) == "100.0000")
    assert(one(rate4(lit(100.00001))) == "100.0000")
    assert(one(rate4(lit(null).cast("double"))) == "")
  }

  test("defaultVersion / expirationSentinel (notebook.py:138-147)") {
    assert(one(defaultVersion(lit(""))) == "1.0.0")
    assert(one(defaultVersion(lit("  "))) == "1.0.0")
    assert(one(defaultVersion(lit("2.1"))) == "2.1")
    assert(one(expirationSentinel(lit("9999-12-31"))) == null)
    assert(one(expirationSentinel(lit("2025-12-31"))) == "2025-12-31")
  }

  test("pround: portable half-up at representation ties") {
    assert(one(pround(lit(1423.755), 2)) == 1423.76)
    assert(one(pround(lit(2.5), 0)) == 3.0)
  }

  test("pctOfMedicare: divide-by-zero → null (benchmark_joiner.py:125-129)") {
    assert(one(pctOfMedicare(lit(10.0), lit(0.0))) == null)
    assert(one(pctOfMedicare(lit(10.0), lit(4.0))) == 2.5)
  }
}
