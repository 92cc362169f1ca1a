package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.ingest.XlsxIngest
import org.apache.spark.sql.types._

class XlsxIngestSpec extends SparkSpec {

  private def writeFixture(dir: java.nio.file.Path, name: String,
      header: Seq[String], rows: Seq[Seq[Any]]): String = {
    val p = dir.resolve(name)
    val out = new FileOutputStream(p.toFile)
    try XlsxIngest.writeXlsx(header, rows, out) finally out.close()
    p.toString
  }

  test("writer→reader round-trip: strings (shared), numbers, booleans, " +
      "nulls") {
    val dir = Files.createTempDirectory("graft-xlsx")
    val p = writeFixture(dir, "a.xlsx", Seq("k", "s", "v", "b"),
      Seq(Seq(1L, "alpha", 1.5, true),
        Seq(2L, "beta & <co>", 2.5, false),
        Seq(3L, null, 3.5, true),     // null cell omitted from the part
        Seq(4L, "alpha", 4.5, false)))  // shared-string reuse
    val rows = XlsxIngest.parseRows(
      Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(rows.head == Seq("k", "s", "v", "b").map(Some(_)))
    assert(rows(1) == Seq(Some("1"), Some("alpha"), Some("1.5"),
      Some("true")))
    assert(rows(2)(1).contains("beta & <co>")) // XML escaping inverts
    assert(rows(3)(1).isEmpty)                 // absent cell → None
    assert(rows(4) == Seq(Some("4"), Some("alpha"), Some("4.5"),
      Some("false")))
  }

  test("readXlsx: glob read, padding, and CSV-identical type inference " +
      "(timestamps via ISO strings)") {
    import sqlImplicits._
    val dir = Files.createTempDirectory("graft-xlsx-glob")
    writeFixture(dir, "a.xlsx", Seq("k", "ts", "v"),
      Seq(Seq(1L, "2024-01-01 10:00:00", 1.5),
        Seq(2L, "2024-01-02 11:30:00", null)))
    writeFixture(dir, "b.xlsx", Seq("k", "ts", "v"),
      Seq(Seq(3L, "01/03/2024 12:00:00", 3.25)))
    val df = XlsxIngest.readXlsx(spark, s"$dir/*.xlsx")
    assert(df.schema("k").dataType == LongType)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("v").dataType == DoubleType)
    val got = df.as[(Long, java.sql.Timestamp, Option[Double])]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0)._3.contains(1.5) && got(1)._3.isEmpty)
    assert(got(2)._2.toInstant.toString == "2024-01-03T12:00:00Z")
  }

  test("hand-built xlsx: inline strings, sparse refs (gap → null), " +
      "rich-text shared strings, sheet part selection") {
    // exercise what OUR writer never emits: inlineStr cells, rich-text
    // <si><r><t> runs, a row with a column gap (A3,C3), and a second
    // sheet part that must be ignored (first sheet wins)
    val sheet1 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>h1</t></is></c>""" +
        """<c r="B1" t="inlineStr"><is><t>h2</t></is></c>""" +
        """<c r="C1" t="inlineStr"><is><t>h3</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>0</v></c>""" +
        """<c r="B2"><v>42</v></c><c r="C2" t="str"><v>calc</v></c></row>""" +
        """<row r="3"><c r="A3"><v>7</v></c><c r="C3"><v>9</v></c></row>""" +
      """</sheetData></worksheet>"""
    val sheet2 =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>WRONG</t></is></c></row>""" +
      """</sheetData></worksheet>"""
    // rich text: two runs concatenate to "rich text"
    val sst = """<?xml version="1.0"?><sst>""" +
      """<si><r><t>rich </t></r><r><t>text</t></r></si></sst>"""
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    def part(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8"))
      z.closeEntry()
    }
    // deliberately adversarial part order: sheet2 then sst then sheet1
    part("xl/worksheets/sheet2.xml", sheet2)
    part("xl/sharedStrings.xml", sst)
    part("xl/worksheets/sheet1.xml", sheet1)
    z.close()
    val rows = XlsxIngest.parseRows(buf.toByteArray)
    assert(rows.head == Seq(Some("h1"), Some("h2"), Some("h3")))
    assert(rows(1) == Seq(Some("rich text"), Some("42"), Some("calc")))
    assert(rows(2) == Seq(Some("7"), None, Some("9")))
  }

  test("date serials: date-styled numeric cells convert via styles.xml " +
      "(writer emits numFmt 22; reader resolves builtin + custom formats)") {
    import sqlImplicits._
    val dir = Files.createTempDirectory("graft-xlsx-dates")
    val ts = java.sql.Timestamp.valueOf("2024-03-15 13:45:30")
    writeFixture(dir, "d.xlsx", Seq("k", "when", "plain"),
      Seq(Seq(1L, ts, 42.5),
        Seq(2L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0), 7.25)))
    // raw parse: serials already ISO strings (style-resolved)...
    val rows = XlsxIngest.parseRows(Files.readAllBytes(dir.resolve("d.xlsx")))
    assert(rows(1)(1).contains("2024-03-15 13:45:30"))
    assert(rows(2)(1).contains("2024-01-01 00:00:00"))
    // ...while the UNSTYLED numeric column stays numeric
    assert(rows(1)(2).contains("42.5"))
    // full read: the ISO strings infer to a typed timestamp column
    val df = XlsxIngest.readXlsx(spark, s"$dir/*.xlsx")
    assert(df.schema("when").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = df.as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(_._1)
    assert(got(0)._2 == ts && got(1)._3 == 7.25)
  }

  test("date1904 workbooks shift the serial epoch") {
    // same serial value means a 1462-day later instant under 1904;
    // hand-build: workbook.xml carries date1904="1", style 1 = fmt 22
    val serial = 25569.5 // 1900 system: 1970-01-01 12:00; 1904: +1462d
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>d</t></is></c></row>""" +
        s"""<row r="2"><c r="A2" s="1"><v>$serial</v></c></row>""" +
      """</sheetData></worksheet>"""
    val styles = """<?xml version="1.0"?><styleSheet><cellXfs count="2">""" +
      """<xf numFmtId="0"/><xf numFmtId="22"/></cellXfs></styleSheet>"""
    val wb = """<?xml version="1.0"?><workbook>""" +
      """<workbookPr date1904="1"/><sheets/></workbook>"""
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    def part(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8"))
      z.closeEntry()
    }
    part("xl/workbook.xml", wb)
    part("xl/styles.xml", styles)
    part("xl/worksheets/sheet1.xml", sheet)
    z.close()
    val rows = XlsxIngest.parseRows(buf.toByteArray)
    assert(rows(1)(0).contains("1974-01-02 12:00:00"))
  }

  test("colIndex decodes multi-letter refs") {
    assert(XlsxIngest.colIndex("A1") == 0)
    assert(XlsxIngest.colIndex("Z9") == 25)
    assert(XlsxIngest.colIndex("AA10") == 26)
    assert(XlsxIngest.colIndex("BC7") == 54)
  }
}
