package graft.ingest

import java.io.{ByteArrayInputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XLSX ingestion — the one reference-implied source its engine never
  * grew (`requirements.txt:9` ships openpyxl; `datapump.py:442` reads
  * CSV only). Built on what the JDK already has: an `.xlsx` file is a
  * zip (`java.util.zip`) of small XML parts (StAX streaming parse,
  * `javax.xml.stream`) — no POI/openpyxl analog needed, which keeps the
  * offline build dependency-free.
  *
  * Scope (documented, honest): first worksheet, header row, shared /
  * inline / formula-cached strings, numeric and boolean cells, sparse
  * rows via cell references (a missing `<c>` is null — openpyxl's
  * `None`, pandas' NaN), and DATE SERIALS: numeric cells whose style
  * resolves to a date/time number format (built-in ids 14–22 / 45–47
  * or a custom y/m/d/h/s format — openpyxl's `is_date_format` rule)
  * convert from the 1900 (or `date1904`) serial system to ISO strings,
  * which then flow through the same all-or-nothing inference as CSV
  * ([[CsvIngest.inferTypes]]) and come out typed timestamps.
  *
  * Scale shape: xlsx is a zip — NOT splittable — so the unit of
  * parallelism is the FILE, the natural layout for drop-folder
  * ingestion (same shape as the reference's CSV queue). The driver
  * reads ONE header; workers stream-parse their files with StAX off
  * the `binaryFile` bytes — constant memory per worksheet row, no DOM,
  * no driver collect of data rows. A 100 TB drop of xlsx files scales
  * by file count exactly like the CSV glob path.
  */
object XlsxIngest {

  // ---------------------------------------------------------------- read

  /** Glob read → header from the first file (driver, metadata-cheap) →
    * distributed per-file StAX parse → CSV-identical type inference. */
  def readXlsx(spark: SparkSession, glob: String,
      formats: Seq[String] = CsvIngest.DefaultFormats): DataFrame = {
    val first = CsvIngest.listByMtimeDesc(spark, glob).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no xlsx files match $glob"))
    val header = {
      val p = new org.apache.hadoop.fs.Path(first)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val bytes = try readAll(in) finally in.close()
      parseRows(bytes).headOption.getOrElse(
        throw new IllegalArgumentException(s"$first has no header row"))
        .map(_.getOrElse(""))
    }
    val n = header.length
    val rows = spark.read.format("binaryFile").load(glob)
      .select("content").rdd
      .flatMap { r =>
        parseRows(r.getAs[Array[Byte]](0)).drop(1).map { cells =>
          // pad/truncate to the header width; missing cells are null
          Row.fromSeq((0 until n).map(i =>
            if (i < cells.length) cells(i).orNull else null))
        }
      }
    val schema = StructType(header.map(StructField(_, StringType)))
    CsvIngest.inferTypes(
      inferNumerics(spark.createDataFrame(rows, schema)), formats)
  }

  /** All-or-nothing numeric typing for the all-string parse — the role
    * CSV's `inferSchema` plays: a column whose every non-null cell
    * try_casts to BIGINT becomes long, else DOUBLE becomes double, else
    * stays string (and may still become a timestamp in
    * [[CsvIngest.inferTypes]]). One aggregation pass decides every
    * column; one projection applies the casts — two jobs regardless of
    * column count, same discipline as inferTypes. */
  private def inferNumerics(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, count}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val scols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq
    if (scols.isEmpty) return df
    val aggs = scols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        count(col(c).try_cast(LongType)).as(s"${c}__l"),
        count(col(c).try_cast(DoubleType)).as(s"${c}__d"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val projected = df.schema.fields.map { f =>
      val nn = if (scols.contains(f.name))
        row.getAs[Long](s"${f.name}__nn") else 0L
      if (nn > 0 && row.getAs[Long](s"${f.name}__l") == nn)
        col(f.name).cast(LongType).as(f.name)
      else if (nn > 0 && row.getAs[Long](s"${f.name}__d") == nn)
        col(f.name).cast(DoubleType).as(f.name)
      else col(f.name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** All rows of the first worksheet as string cells (None = absent
    * cell). Streaming: one pass over sharedStrings, one over the sheet;
    * memory is O(shared-string table + one row). */
  def parseRows(bytes: Array[Byte]): Seq[Seq[Option[String]]] = {
    // pass 1: locate parts. Zip entries stream in file order; xlsx
    // writers order parts arbitrarily, so collect the two we need.
    var shared: Vector[String] = Vector.empty
    var sheet: Option[Array[Byte]] = None
    var sheetName: String = null
    var dateStyles: Set[Int] = Set.empty
    var date1904 = false
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml")
          shared = parseSharedStrings(readAll(zin))
        else if (name == "xl/styles.xml")
          dateStyles = parseDateStyles(readAll(zin))
        else if (name == "xl/workbook.xml")
          date1904 = new String(readAll(zin), "UTF-8")
            .contains("date1904=\"1\"")
        else if (name.startsWith("xl/worksheets/sheet") &&
            name.endsWith(".xml") &&
            // first sheet by part number (sheet1.xml < sheet2.xml …)
            (sheetName == null || ordinal(name) < ordinal(sheetName))) {
          sheet = Some(readAll(zin))
          sheetName = name
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    sheet match {
      case Some(b) => parseSheet(b, shared, dateStyles, date1904)
      case _ => throw new IllegalArgumentException(
        "xlsx has no worksheet part")
    }
  }

  /** 0-based `cellXfs` indexes whose number format is a DATE/TIME format
    * — built-in ids 14–22 and 45–47, or a custom `numFmt` whose code
    * contains a date token outside quoted literals (openpyxl's
    * `is_date_format` rule, simplified to the y/m/d/h/s alphabet). */
  private def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val builtinDate = (14 to 22).toSet ++ (45 to 47)
    var customDate = Set.empty[Int]
    val xfs = Vector.newBuilder[Int]
    val r = staxReader(bytes)
    var inCellXfs = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "cellXfs" => inCellXfs = true
              case "numFmt" =>
                val id = Option(r.getAttributeValue(null, "numFmtId"))
                  .flatMap(_.toIntOption)
                val code = Option(r.getAttributeValue(null, "formatCode"))
                  .getOrElse("")
                val noQuotes = code.replaceAll("\"[^\"]*\"", "")
                  .replaceAll("\\[[^\\]]*\\]", "") // strip [Red] etc.
                if (id.isDefined && noQuotes.exists("ymdhsYMDHS".contains(_)))
                  customDate += id.get
              case "xf" if inCellXfs =>
                xfs += Option(r.getAttributeValue(null, "numFmtId"))
                  .flatMap(_.toIntOption).getOrElse(0)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT
              if r.getLocalName == "cellXfs" => inCellXfs = false
          case _ =>
        }
      }
    } finally r.close()
    xfs.result().zipWithIndex.collect {
      case (fmt, i) if builtinDate(fmt) || customDate(fmt) => i
    }.toSet
  }

  /** Excel serial → ISO instant string. Serial day 25569 (1900 system)
    * / 24107 (1904 system) = 1970-01-01; the fraction is time-of-day.
    * Rounded to the nearest second — serials are binary doubles, so a
    * wall-clock second stored as a serial carries ~µs float noise. */
  private def serialToIso(serial: Double, date1904: Boolean): String = {
    val epochDay = if (date1904) 24107L else 25569L
    val secs = Math.round((serial - epochDay) * 86400.0)
    java.time.LocalDateTime.ofEpochSecond(secs, 0,
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private def ordinal(part: String): Int =
    part.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml") match {
      case "" => 1
      case s => s.toIntOption.getOrElse(Int.MaxValue)
    }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var k = in.read(buf)
    while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
    out.toByteArray
  }

  private def staxReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // hardening: never resolve external entities from workbook XML
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
  }

  /** `<si>` entries; rich-text runs (`<r><t>…</t></r>`) concatenate —
    * openpyxl's `value` semantics. */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = staxReader(bytes)
    val sb = new java.lang.StringBuilder
    var inT = false; var inSi = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.setLength(0)
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += sb.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Worksheet rows. Cell typing per the `t` attribute: `s` = shared-
    * string index, `inlineStr` = `<is><t>`, `str` = formula-cached
    * string, `b` = boolean (0/1 → false/true), default = numeric raw.
    * The `r` ref ("B3") places values at their true column so gaps
    * read back as null. */
  private def parseSheet(bytes: Array[Byte], shared: Vector[String],
      dateStyles: Set[Int] = Set.empty,
      date1904: Boolean = false): Seq[Seq[Option[String]]] = {
    val rows = ArrayBuffer.empty[Seq[Option[String]]]
    val r = staxReader(bytes)
    var row: ArrayBuffer[Option[String]] = null
    var cellType = ""; var cellCol = -1; var nextCol = 0
    var cellStyle = -1
    var inV = false; var inIsT = false
    val sb = new java.lang.StringBuilder
    def put(col: Int, v: Option[String]): Unit = {
      while (row.length <= col) row += None
      row(col) = v
    }
    def closeCell(): Unit = if (cellCol >= 0) {
      val raw = sb.toString
      val v = cellType match {
        case "s" => raw.trim.toIntOption.flatMap(shared.lift)
        case "b" => Some(if (raw.trim == "1") "true" else "false")
        case "" | "n" if dateStyles(cellStyle) =>
          // date-styled numeric: serial → ISO (falls through raw when
          // the value is not numeric, e.g. a cached formula error)
          raw.trim.toDoubleOption.map(serialToIso(_, date1904))
            .orElse(Some(raw))
        case _ => Some(raw) // inlineStr/str/n and untyped numerics
      }
      // an empty untyped <c> with no <v> is an absent cell, not ""
      if (sb.length() > 0 || cellType == "inlineStr" || cellType == "str")
        put(cellCol, v)
      cellCol = -1
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer.empty; nextCol = 0
              case "c" if row != null =>
                val ref = r.getAttributeValue(null, "r")
                cellCol = if (ref == null) nextCol else colIndex(ref)
                nextCol = cellCol + 1
                cellType = Option(r.getAttributeValue(null, "t"))
                  .getOrElse("")
                cellStyle = Option(r.getAttributeValue(null, "s"))
                  .flatMap(_.toIntOption).getOrElse(-1)
                sb.setLength(0)
              case "v" if cellCol >= 0 => inV = true
              case "t" if cellCol >= 0 && cellType == "inlineStr" =>
                inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if inV || inIsT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" if inIsT => inIsT = false
              case "c" => closeCell()
              case "row" if row != null =>
                rows += row.toSeq; row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  /** "BC7" → 0-based column 54. */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  // --------------------------------------------------------------- write

  private def colRef(col: Int): String = {
    var c = col + 1; val sb = new StringBuilder
    while (c > 0) { val d = (c - 1) % 26; sb.insert(0, ('A' + d).toChar); c = (c - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case c => c.toString
  }

  /** Minimal single-sheet xlsx writer — the fixture/export half of the
    * round-trip (openpyxl's role in the reference stack). Strings go
    * through a REAL sharedStrings part (the layout Excel itself writes,
    * so the reader's shared-string path is what production files hit);
    * numbers and booleans are typed cells; null cells are omitted
    * (sparse, ref-addressed). Driver-side by design: xlsx export is a
    * small-report format — bulk output belongs to parquet/CSV sinks. */
  def writeXlsx(header: Seq[String], rows: Iterable[Seq[Any]],
      out: OutputStream): Unit = {
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstId(s: String): Int = sst.getOrElseUpdate(s, sst.size)

    val sheet = new StringBuilder
    sheet ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    def dateCell(ref: String, epochSec: Long): String = {
      val serial = epochSec / 86400.0 + 25569.0
      s"""<c r="$ref" s="1"><v>$serial</v></c>""" // style 1 = numFmt 22
    }
    def cell(ref: String, v: Any): String = v match {
      case null | None => ""
      case Some(x) => cell(ref, x)
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case t: java.sql.Timestamp => dateCell(ref, t.getTime / 1000)
      case t: java.time.Instant => dateCell(ref, t.getEpochSecond)
      case t: java.time.LocalDateTime =>
        dateCell(ref, t.toEpochSecond(java.time.ZoneOffset.UTC))
      case n @ (_: Int | _: Long | _: Double | _: Float | _: Short |
          _: Byte | _: BigDecimal) => s"""<c r="$ref"><v>$n</v></c>"""
      case s => s"""<c r="$ref" t="s"><v>${sstId(s.toString)}</v></c>"""
    }
    ((header: Seq[Any]) +: rows.toSeq).zipWithIndex.foreach {
      case (cells, ri) =>
        sheet ++= s"""<row r="${ri + 1}">"""
        cells.zipWithIndex.foreach { case (v, ci) =>
          sheet ++= cell(s"${colRef(ci)}${ri + 1}", v)
        }
        sheet ++= "</row>"
    }
    sheet ++= "</sheetData></worksheet>"

    val sstXml = new StringBuilder
    sstXml ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sstXml ++= s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">"""
    sst.keys.foreach(s => sstXml ++= s"<si><t>${xmlEscape(s)}</t></si>")
    sstXml ++= "</sst>"

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
      """<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      """</Relationships>"""
    // style index 1 → built-in numFmt 22 ("m/d/yy h:mm") — the date
    // style the reader resolves; index 0 stays the default General
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>""" +
      """</styleSheet>"""

    val z = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    try {
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", wbRels)
      part("xl/sharedStrings.xml", sstXml.toString)
      part("xl/styles.xml", styles)
      part("xl/worksheets/sheet1.xml", sheet.toString)
    } finally z.close()
  }
}
