package graft

import graft.sources.XlsxSource

/** The pure-JDK xlsx codec: cell-type coverage (shared strings, inline
  * strings, formula-cached strings, booleans, numbers), sparse-row
  * densification from cell references, writer→reader round-trip with
  * XML-hostile content, and the distributed read surface. */
class XlsxSourceSpec extends SparkSpec {

  /** Hand-built workbook exercising the parts our WRITER never emits:
    * sharedStrings.xml (t="s"), sparse cells (r="C2" with A/B absent),
    * formula-cached strings (t="str"), booleans, and a rels target
    * that differs from the sheet's ordinal. */
  private def handBuilt(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    part("[Content_Types].xml", "<Types/>") // parser never reads it
    part("xl/workbook.xml",
      """<workbook xmlns:r="x"><sheets>""" +
      """<sheet name="Data" sheetId="1" r:id="rId9"/>""" +
      "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships>""" +
      """<Relationship Id="rId9" Target="worksheets/weird7.xml" Type="t"/>""" +
      "</Relationships>")
    part("xl/sharedStrings.xml",
      "<sst><si><t>CODE</t></si><si><t>RATE</t></si>" +
      "<si><t>FLAG</t></si>" +
      // rich-text run: two <t> fragments concatenate
      "<si><r><t>99</t></r><r><t>213</t></r></si></sst>")
    part("xl/worksheets/weird7.xml",
      "<worksheet><sheetData>" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
      // sparse: only C present; A/B must come back null
      """<row r="2"><c r="C2" t="b"><v>1</v></c></row>""" +
      // shared rich-text, plain number, formula-cached string
      """<row r="3"><c r="A3" t="s"><v>3</v></c>""" +
      """<c r="B3"><v>123.45</v></c>""" +
      """<c r="C3" t="str"><v>computed</v></c></row>""" +
      "</sheetData></worksheet>")
    zos.close(); bos.toByteArray
  }

  test("parser: shared/rich/sparse/bool/str cells, rels indirection") {
    val sheets = XlsxSource.parseWorkbook(handBuilt())
    assert(sheets.map(_._1) == Seq("Data"))
    val rows = sheets.head._2
    assert(rows(0) == Seq("CODE", "RATE", "FLAG"))
    assert(rows(1) == Seq(null, null, "true"), rows(1).toString)
    assert(rows(2) == Seq("99213", "123.45", "computed"))
  }

  test("column reference arithmetic") {
    assert(XlsxSource.colIndex("A1") == 0)
    assert(XlsxSource.colIndex("Z9") == 25)
    assert(XlsxSource.colIndex("AA10") == 26)
    assert(XlsxSource.colIndex("BC12") == 54)
  }

  test("writer -> reader round-trip, XML-hostile strings intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val nasty = """<tag> & "quoted" 'n £unicode"""
    XlsxSource.writeWorkbook(s"$dir/t.xlsx", Seq(
      ("S1", Seq("A", "B"), Seq(Seq(nasty, 1.5), Seq(null, -2.0))),
      ("S2", Seq("A", "C"), Seq(Seq("x", true)))))
    val parsed = XlsxSource.parseWorkbook(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/t.xlsx"))).toMap
    assert(parsed("S1") == Seq(Seq("A", "B"),
      Seq(nasty, "1.5"), Seq(null, "-2.0")))
    assert(parsed("S2") == Seq(Seq("A", "C"), Seq("x", "true")))

    // the distributed surface: union-by-name with null padding + the
    // provenance columns
    val df = XlsxSource.readSheets(spark, dir, Seq("S1", "S2"))
    assert(df.columns.toSeq == Seq("src_file", "sheet", "A", "B", "C"))
    val got = df.collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .sortBy(t => (t._1, String.valueOf(t._2)))
    assert(got.toSeq == Seq(
      ("S1", nasty, "1.5", null), // "<" sorts before "null"
      ("S1", null, "-2.0", null),
      ("S2", "x", null, "true")))
  }

  test("missing sheet and non-xlsx input fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx2").toString
    XlsxSource.writeWorkbook(s"$dir/t.xlsx",
      Seq(("Only", Seq("A"), Seq(Seq("v")))))
    intercept[IllegalArgumentException] {
      XlsxSource.readSheets(spark, dir, Seq("Nope"))
    }
    intercept[IllegalArgumentException] {
      XlsxSource.parseWorkbook("PKgarbage".getBytes("UTF-8"))
    }
  }
}
