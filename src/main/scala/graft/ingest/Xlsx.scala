package graft.ingest

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.xml.XML

/** Spreadsheet (xlsx) ingestion — SURVEY.md §2.1 row S5, previously
  * declared out of scope for lack of an offline connector jar. XLSX is a
  * zip of XML parts, and the JDK ships both codecs, so this is a minimal
  * self-contained reader: first sheet, first row = header, every cell
  * surfaced as a string (downstream typing is [[Coerce.bestFit]]'s job,
  * same as CSV).
  *
  * Distribution model: files load through Spark's `binaryFile` source, so
  * a directory of workbooks parses in parallel across executors — one
  * task per file, which matches how spreadsheet-sized inputs arrive
  * (many small files, never one 100 TB workbook).
  *
  * Supported: inline strings, shared strings, numbers, booleans, gaps
  * (missing cells become nulls via A1-reference column mapping). Not
  * supported: formulas (cached values are read), styles, multiple sheets.
  */
object Xlsx {

  /** XML loader with external entities + DTDs disabled: workbooks are
    * untrusted input, and scala.xml's default SAX parser would otherwise
    * resolve XXE payloads embedded in a crafted sheet. */
  private def loadXml(s: String): scala.xml.Elem = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    XML.withSAXParser(f.newSAXParser()).loadString(s)
  }

  /** First sheet = the `xl/worksheets/sheet<N>.xml` part with the lowest
    * N (falling back to lexicographic order for non-numeric names), so a
    * workbook whose parts are named sheet2.xml/sheet3.xml still reads its
    * first sheet rather than failing on a hardcoded sheet1.xml. */
  private val SheetName = """xl/worksheets/(?:[^/]*?)(\d*)\.xml""".r

  /** Overflow-safe ordering key for a sheet part name: for digit strings,
    * numeric order == (length, lexicographic) order, so no toLong that a
    * 20-digit crafted name could blow up; digitless names sort last. */
  private def sheetKey(name: String): (Int, String, String) = {
    val SheetName(digits) = name: @unchecked
    if (digits.isEmpty) (Int.MaxValue, "", name) else (digits.length, digits, name)
  }

  /** Parse one workbook's bytes into header + string rows. */
  private[ingest] def parseWorkbook(bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    // legacy binary .xls is an OLE2/CFB container (magic D0 CF 11 E0),
    // not a zip of XML parts — a DOCUMENTED refusal (SURVEY §7.4): name
    // the format instead of failing later with "no worksheets"
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
        (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0)
      throw new IllegalArgumentException(
        "legacy binary .xls (OLE2/CFB container) is not supported — " +
          "re-save as .xlsx (Office Open XML); only the zip-of-XML format is implemented")
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var shared = IndexedSeq.empty[String]
    // only the first-ordered sheet is parsed — keep best-so-far while
    // streaming the zip instead of buffering every sheet's XML
    var bestSheet: Option[(String, String)] = None // part name -> xml
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { entry =>
        entry.getName match {
          case "xl/sharedStrings.xml" =>
            val xml = loadXml(new String(zin.readAllBytes(), "UTF-8"))
            shared = (xml \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
          case n @ SheetName(_)
              if bestSheet.forall { case (cur, _) => Ordering[(Int, String, String)].lt(sheetKey(n), sheetKey(cur)) } =>
            bestSheet = Some(n -> new String(zin.readAllBytes(), "UTF-8"))
          case _ => ()
        }
      }
    } finally zin.close()
    val sheet = bestSheet.map(_._2)
      .getOrElse(throw new IllegalArgumentException("no xl/worksheets/*.xml part in workbook"))
    val xml = loadXml(sheet)
    val rows = (xml \\ "row").map { r =>
      var nextIdx = 0 // the r= reference attribute is optional: absent means "next column"
      val cells = (r \ "c").map { c =>
        val ref = (c \@ "r") // e.g. "B3"
        val letters = ref.takeWhile(_.isLetter)
        val colIdx =
          if (letters.isEmpty) nextIdx
          else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
        nextIdx = colIdx + 1
        val t = c \@ "t"
        val vText = (c \ "v").text
        // Styled blanks (<c .../> with a type/style but no <v>) are null,
        // never "" — and a blank shared-string cell must not crash toInt.
        val v = t match {
          case "s" => if (vText.trim.isEmpty) null else shared(vText.trim.toInt)
          case "inlineStr" =>
            val is = (c \ "is" \\ "t").map(_.text).mkString
            if (is.isEmpty && (c \ "is").isEmpty) null else is
          case "b" => if (vText.trim.isEmpty) null else if (vText.trim == "1") "true" else "false"
          case _ => if (vText.isEmpty) null else vText
        }
        colIdx -> v
      }
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val arr = Array.fill[String](width)(null)
      cells.foreach { case (i, v) => arr(i) = v }
      arr.toSeq
    }
    if (rows.isEmpty) (Nil, Nil)
    else {
      val header = rows.head.map(h => Option(h).getOrElse(""))
      val width = header.size
      val data = rows.tail.map(r => r.padTo(width, null).take(width))
      (header, data)
    }
  }

  /** Minimal xlsx writer (inline strings only) — enough to round-trip
    * spreadsheet-sized data and to generate fixtures. Spreadsheets are a
    * small-data interchange format by definition; rows are materialized
    * on the driver (callers pass bounded frames — dims, reports). */
  def write(header: Seq[String], rows: Seq[Seq[String]], path: String): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def rowXml(r: Int, cells: Seq[String]): String =
      cells.zipWithIndex.map { case (v, i) =>
        val colRef = {
          var n = i + 1; val sb = new StringBuilder
          while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
          sb.toString
        }
        if (v == null) "" else s"""<c r="$colRef$r" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString(s"""<row r="$r">""", "", "</row>")
    val sheet = (header +: rows).zipWithIndex
      .map { case (r, i) => rowXml(i + 1, r) }
      .mkString("""<?xml version="1.0"?><worksheet><sheetData>""", "", "</sheetData></worksheet>")
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      zip.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
      zip.write("""<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""".getBytes("UTF-8"))
      zip.closeEntry()
      zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zip.write(sheet.getBytes("UTF-8"))
      zip.closeEntry()
    } finally zip.close()
  }

  /** S5: read a directory (or single file) of .xlsx workbooks into a
    * DataFrame of strings with sanitized header names. All workbooks must
    * share the first file's header. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select("path", "content")
    val parsed = files.rdd.map { row =>
      val (header, data) = parseWorkbook(row.getAs[Array[Byte]]("content"))
      (row.getString(0), header, data)
    }.persist() // header check + row extraction both read this: parse each workbook once
    try {
      val headers = parsed.map { case (p, h, _) => (p, h) }.collect().sortBy(_._1)
      require(headers.nonEmpty, s"no .xlsx files under $path")
      val header = headers.head._2
      headers.foreach { case (p, h) =>
        require(h == header, s"workbook $p header $h != ${headers.head._1} header $header")
      }
      val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
      val rows = parsed.flatMap { case (_, _, data) => data.map(Row.fromSeq(_)) }
      // localCheckpoint (eager) materializes from the still-persisted RDD
      // and CUTS the lineage, so `parsed` can unpersist immediately and
      // the checkpoint blocks are released by the ContextCleaner when the
      // returned frame is collected — unlike cache(), nothing stays
      // pinned for the session.
      Sanitize(spark.createDataFrame(rows, schema).localCheckpoint(true))
    } finally parsed.unpersist()
  }
}
