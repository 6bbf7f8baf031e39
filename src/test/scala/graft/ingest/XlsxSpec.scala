package graft.ingest

import graft.SparkFixture
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

class XlsxSpec extends AnyFunSuite with SparkFixture {

  /** Build a minimal real xlsx: shared strings + one sheet. */
  private def makeXlsx(sharedStrings: Seq[String], sheetRows: Seq[String],
                       sheetPart: String = "xl/worksheets/sheet1.xml"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("[Content_Types].xml", """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst>${sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    put(sheetPart,
      s"""<?xml version="1.0"?><worksheet><sheetData>${sheetRows.mkString}</sheetData></worksheet>""")
    zip.close()
    bos.toByteArray
  }

  private val book: Array[Byte] = makeXlsx(
    sharedStrings = Seq("User ID!", "Full Name", "Score %", "alice", "bob"),
    sheetRows = Seq(
      // header via shared strings
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""",
      // data: number, shared string, inline string, gap handling
      """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>95.5</v></c></row>""",
      """<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>carol</t></is></c></row>""",
      """<row r="4"><c r="A4"><v>3</v></c><c r="C4"><v>77</v></c></row>""",
    ),
  )

  test("parseWorkbook handles shared strings, inline strings, numbers, gaps") {
    val (header, rows) = Xlsx.parseWorkbook(book)
    assert(header == Seq("User ID!", "Full Name", "Score %"))
    assert(rows == Seq(
      Seq("1", "alice", "95.5"),
      Seq("2", "carol", null),
      Seq("3", null, "77"),
    ))
  }

  test("parseWorkbook reads a workbook whose first sheet part is not sheet1.xml") {
    val oddBook = makeXlsx(
      sharedStrings = Seq("k"),
      sheetRows = Seq(
        """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""",
        """<row r="2"><c r="A2"><v>42</v></c></row>""",
      ),
      sheetPart = "xl/worksheets/sheet3.xml",
    )
    val (header, rows) = Xlsx.parseWorkbook(oddBook)
    assert(header == Seq("k"))
    assert(rows == Seq(Seq("42")))
  }

  test("parseWorkbook rejects DOCTYPE (XXE) payloads instead of resolving them") {
    val evil = makeXlsx(
      sharedStrings = Seq("k"),
      sheetRows = Seq("""<row r="1"><c r="A1" t="s"><v>0</v></c></row>"""),
    )
    // splice a DOCTYPE into the sheet xml by rebuilding with a poisoned part
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(
      """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY xxe SYSTEM "file:///etc/hostname">]><worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>&xxe;</t></is></c></row></sheetData></worksheet>""".getBytes("UTF-8"))
    zip.closeEntry()
    zip.close()
    assertThrows[org.xml.sax.SAXParseException] {
      Xlsx.parseWorkbook(bos.toByteArray)
    }
    // and the benign book still parses through the hardened loader
    assert(Xlsx.parseWorkbook(evil)._1 == Seq("k"))
  }

  test("parseWorkbook names the legacy OLE2 .xls format in its refusal") {
    // the CFB magic D0 CF 11 E0: the documented refusal must say what
    // the file IS, not fail later with "no worksheets"
    val ole2 = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte, 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](Xlsx.parseWorkbook(ole2))
    assert(e.getMessage.contains("OLE2") && e.getMessage.contains(".xlsx"))
  }

  test("read: distributed parse, sanitized headers, coercible output") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "xlsx")
    Files.createDirectories(dir)
    Files.walk(dir).filter(_.toString.endsWith(".xlsx")).forEach(f => Files.deleteIfExists(f))
    val out = new FileOutputStream(dir.resolve("book1.xlsx").toFile)
    out.write(book); out.close()

    val df = Xlsx.read(spark, dir.toString)
    assert(df.columns.toSeq == Seq("user_id", "full_name", "score"))
    assert(df.count() == 3)

    val typed = Coerce.bestFit(df)
    assert(typed.schema("user_id").dataType.typeName == "long")
    assert(typed.schema("score").dataType.typeName == "double")
    assert(typed.schema("full_name").dataType.typeName == "string")
  }
}
