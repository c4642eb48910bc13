package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Real `.xlsx` ingestion (S6) with zero external codecs: an xlsx file
  * is a zip of SpreadsheetML XML parts, so `java.util.zip` + the JDK's
  * StAX parser cover the whole format surface the reference touches
  * (src/extractors/excel_extractor.py:14-44 — three named sheets of a
  * rate workbook, header row, string/number cells).
  *
  * Layout: the WORKBOOK is the unit of parallelism. A zip member
  * cannot be split, so one task parses one workbook — the right grain
  * for this format class (fee-schedule workbooks are small config
  * artifacts; a directory of them fans out via Spark's `binaryFile`
  * source, metadata-only at plan time). Parsing is executor-side
  * StAX streaming: constant memory per sheet row, no DOM.
  *
  * Cell coverage: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula-cached strings (`t="str"`), booleans
  * (`t="b"` → true/false) and plain numeric cells; sparse rows are
  * re-densified from the `r="BC12"` cell references. Everything is
  * surfaced as STRING columns (the reference's pandas frame is also
  * object-typed until it casts) — numeric/date typing is the
  * caller's cast, exactly like the CSV source. Styled date serials
  * come back as their raw numeric text.
  *
  * The [[writeWorkbook]] twin emits the same profile (inline strings,
  * plain numbers) — it exists for fixtures and small dim exports; the
  * reader is the production surface.
  */
object XlsxSource {

  // ------------------------------------------------------------- parse

  /** Parse one workbook: sheet name → dense rows of nullable cell
    * strings (each row padded to its own last occupied column). */
  def parseWorkbook(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val parts = zipEntries(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    // workbook.xml gives sheet order + names + r:id; the rels part
    // maps r:id → worksheet part path
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: no xl/workbook.xml"))
    val rels = parts.get("xl/_rels/workbook.xml.rels")
      .map(parseRels).getOrElse(Map.empty)
    parseSheetIndex(wb).map { case (name, rid) =>
      val target = rels.getOrElse(rid, s"worksheets/sheet$rid.xml")
      val path = if (target.startsWith("/")) target.drop(1)
                 else "xl/" + target
      val rows = parts.get(path).map(parseSheet(_, shared))
        .getOrElse(Seq.empty)
      name -> rows
    }
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** Hardened StAX reader: DTDs and external entities off (an xlsx
    * from outside is untrusted input). */
  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  private def attr(r: javax.xml.stream.XMLStreamReader,
                   name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name)
        return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  /** sheet name → relationship id, in workbook order. */
  private def parseSheetIndex(wb: Array[Byte]): Seq[(String, String)] = {
    val r = xmlReader(wb)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet")
        for (n <- attr(r, "name"); rid <- attr(r, "id"))
          out += ((n, rid))
    }
    r.close(); out.result()
  }

  /** relationship id → target part path (relative to xl/). */
  private def parseRels(rels: Array[Byte]): Map[String, String] = {
    val r = xmlReader(rels)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship")
        for (id <- attr(r, "Id"); t <- attr(r, "Target"))
          out += id -> t
    }
    r.close(); out.result()
  }

  private def parseSharedStrings(ss: Array[Byte]): IndexedSeq[String] = {
    val r = xmlReader(ss)
    val out = IndexedSeq.newBuilder[String]
    var inSi = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") { inSi = true; sb.clear() }
          else if (inSi && r.getLocalName == "t")
            sb.append(r.getElementText) // concatenates rich-text runs
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "si") { inSi = false; out += sb.toString }
        case _ =>
      }
    }
    r.close(); out.result()
  }

  /** "BC12" → 0-based column index (54). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(sheet: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = xmlReader(sheet)
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellValue: String = null
    var sawValue = false
    def put(): Unit = if (row != null && cellCol >= 0 && sawValue) {
      while (row.length <= cellCol) row += null
      row(cellCol) = cellType match {
        case "s" =>
          val i = cellValue.trim.toInt
          if (i >= 0 && i < shared.length) shared(i) else null
        case "b" => if (cellValue.trim == "1") "true" else "false"
        case _ => cellValue
      }
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
              cellCol = -1
            case "c" =>
              cellCol = attr(r, "r").map(colIndex)
                .getOrElse(cellCol + 1) // no ref: next column
              cellType = attr(r, "t").getOrElse("")
              cellValue = null; sawValue = false
            case "v" =>
              cellValue = r.getElementText; sawValue = true; put()
            case "t" if cellType == "inlineStr" =>
              cellValue = r.getElementText; sawValue = true
              cellType = ""; put()
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "row" && row != null) {
            rows += row.toSeq; row = null
          }
        case _ =>
      }
    }
    r.close(); rows.result()
  }

  // ------------------------------------------------------ spark surface

  /** Read named sheets from every workbook under `path`, first row as
    * header, all columns STRING, null-padded `unionByName` across
    * sheets (the reference's concat semantics) plus `sheet` and
    * `src_file` provenance columns. The schema is resolved driver-side
    * from ONE workbook (header rows only); the data pass is
    * executor-side over Spark's `binaryFile` source — one task per
    * workbook, the format's natural grain. */
  def readSheets(spark: SparkSession, path: String,
                 sheetNames: Seq[String]): DataFrame = {
    val firstFile = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val st = fs.getFileStatus(p)
      if (st.isFile) p
      else fs.listStatus(p).filter(_.isFile)
        .map(_.getPath).filter(_.getName.endsWith(".xlsx"))
        .sortBy(_.getName).headOption
        .getOrElse(throw new IllegalArgumentException(
          s"no .xlsx file under $path"))
    }
    val headBytes = {
      val fs = firstFile.getFileSystem(spark.sessionState.newHadoopConf())
      val in = fs.open(firstFile)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    }
    val bySheet = parseWorkbook(headBytes).toMap
    val headers: Seq[(String, Seq[String])] = sheetNames.map { sn =>
      val hdr = bySheet.getOrElse(sn, throw new IllegalArgumentException(
        s"workbook $firstFile has no sheet '$sn' " +
          s"(has: ${bySheet.keys.mkString(", ")})"))
        .headOption.getOrElse(Seq.empty)
      sn -> hdr.map(h => if (h == null) "" else h)
    }
    // union of headers, first-seen order — the unionByName column set
    val columns: Seq[String] = headers.flatMap(_._2).distinct
    val schema = StructType(
      StructField("src_file", StringType) +:
      StructField("sheet", StringType) +:
        columns.map(c => StructField(c, StringType)))
    val wanted = sheetNames.toSet
    val colArr = columns.toArray
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("path"), col("content"))
    import spark.implicits._
    bin.as[(String, Array[Byte])].flatMap { case (file, bytes) =>
      parseWorkbook(bytes).iterator
        .filter { case (sn, _) => wanted(sn) }
        .flatMap { case (sn, rows) =>
          rows.headOption.iterator.flatMap { hdr =>
            val idx = colArr.map(c => hdr.indexOf(c))
            rows.iterator.drop(1).map { cells =>
              val vals = idx.map { i =>
                if (i < 0 || i >= cells.length) null else cells(i)
              }
              Row.fromSeq(file +: sn +: vals.toSeq)
            }
          }
        }
    }(org.apache.spark.sql.Encoders.row(schema))
      .toDF()
  }

  // ------------------------------------------------------------- write

  /** Write a minimal real workbook: inline-string cells for strings,
    * plain `<v>` for numbers, one part per sheet. Fixture/export use
    * (a fee-schedule-class artifact is driver-sized by nature). */
  def writeWorkbook(path: String,
                    sheets: Seq[(String, Seq[String], Seq[Seq[Any]])]): Unit = {
    def xml(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(f))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val n = sheets.size
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString + "</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>")
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _, _), i) =>
        s"""<sheet name="${xml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, header, rows), i) =>
      def cell(v: Any): String = v match {
        case null => "<c/>" // empty cell HOLDS its column position
        case s: String => s"""<c t="inlineStr"><is><t>${xml(s)}</t></is></c>"""
        case b: Boolean => s"""<c t="b"><v>${if (b) 1 else 0}</v></c>"""
        case x => s"<c><v>${xml(String.valueOf(x))}</v></c>"
      }
      val body =
        ("<row>" + header.map(h => cell(h)).mkString + "</row>") +
          rows.map(r => "<row>" + r.map(cell).mkString + "</row>").mkString
      part(s"xl/worksheets/sheet${i + 1}.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        body + "</sheetData></worksheet>")
    }
    zos.close()
  }
}
