package graft

import org.apache.spark.sql.functions._
import graft.functions.Categorizer

/** Boundary corpus from FIXTURES.md §6
  * (src/transformers/categorizer.py:69-254 semantics). */
class CategorizerSpec extends SparkSpec {
  import spark.implicits._

  private def cat(code: String): (String, String, String) = {
    val r = Seq(code).toDF("code")
      .select(Categorizer.categorize(col("code")).as("c"))
      .select("c.proc_set", "c.proc_class", "c.proc_group").head
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("prefix rules dispatch before numeric ranges") {
    assert(cat("G0008") == (("HCPCS", "Medicare Specific", "G-Codes")))
    assert(cat("IME01") == (("HCPCS", "Facility Specific", "IME Codes")))
  }

  test("non-numeric and null → Unknown") {
    assert(cat("ABC") == (("Unknown", "Unknown", "Unknown")))
    assert(cat(null) == (("Unknown", "Unknown", "Unknown")))
  }

  test("out-of-range numeric → Other") {
    assert(cat("9999") == (("Other", "Miscellaneous", "Unspecified")))
    assert(cat("100000") == (("Other", "Miscellaneous", "Unspecified")))
  }

  test("range boundaries (FIXTURES.md §6)") {
    assert(cat("10000")._1 == "Surgery")
    assert(cat("69999")._1 == "Surgery")
    assert(cat("70000")._1 == "Radiology")
    assert(cat("79999")._1 == "Radiology")
    assert(cat("80000")._1 == "Pathology & Laboratory")
    assert(cat("89999")._1 == "Pathology & Laboratory")
    assert(cat("88999")._2 == "Anatomic Pathology")
    assert(cat("89000")._2 == "Other Laboratory")
    assert(cat("90000")._1 == "Medicine")
    assert(cat("98999")._1 == "Medicine")
    assert(cat("99000")._1 == "Evaluation & Management")
    assert(cat("99999")._1 == "Evaluation & Management")
  }

  test("E&M sub-ranges (checked before Medicine)") {
    assert(cat("99091") == (("Evaluation & Management", "Remote Monitoring", "Digital Health")))
    assert(cat("99202")._2 == "Office Visits")
    assert(cat("99215")._2 == "Office Visits")
    assert(cat("99216")._2 == "Other E&M")
  }

  // Cross-engine agreement of categorize vs sqlCase is covered by the
  // f_categorize DuckDB-oracle gate over the full part table.
}
