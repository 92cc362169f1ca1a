package graft

import java.nio.file.Files
import graft.ingest.CsvIngest
import org.apache.spark.sql.types._

class CsvIngestSpec extends SparkSpec {

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("graft-csv", ".csv")
    Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("all-or-nothing timestamp inference: clean column becomes timestamp") {
    val p = writeCsv(
      "ts,x\n2024-01-01 10:00:00,1\n01/02/2024 11:00:00,2\n")
    val df = CsvIngest.readCsv(spark, p)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("x").dataType == LongType) // int coarsened to long
  }

  test("one garbage value makes the whole column text (datapump.py:155)") {
    val p = writeCsv(
      "ts,x\n2024-01-01 10:00:00,1\nnot-a-date,2\n2024-01-03 10:00:00,3\n")
    val df = CsvIngest.readCsv(spark, p)
    assert(df.schema("ts").dataType == StringType)
  }

  test("empty strings read as nulls; all-null column stays text") {
    val p = writeCsv("a,b\n,x\n,y\n")
    val df = CsvIngest.readCsv(spark, p)
    assert(df.filter(df("a").isNull).count() == 2)
    assert(df.schema("a").dataType == StringType)
  }

  test("format order: first matching format wins (ambiguous day<=12)") {
    // 01/02/2024 is ambiguous; MM/dd comes before dd.MM in the list but
    // dd.MM uses dots so there is no cross-format ambiguity by design.
    val p = writeCsv("ts\n01/02/2024 00:00:00\n")
    val df = CsvIngest.readCsv(spark, p)
    val got = df.collect()(0).getTimestamp(0).toInstant.toString
    assert(got == "2024-01-02T00:00:00Z") // parsed as MM/dd, not dd.MM
  }

  test("floats coarsen to double, leading whitespace stripped") {
    val p = writeCsv("a,b\n 1.5,  x\n2.5,y\n")
    val df = CsvIngest.readCsv(spark, p)
    assert(df.schema("a").dataType == DoubleType)
    assert(df.select("b").collect().map(_.getString(0)).toSet == Set("x", "y"))
  }

  test("na_values='' parity: quoted AND unquoted empty fields both read " +
      "as null (pandas default NaN set contains '' either way)") {
    // a: bare empty; b: quoted empty; c: quoted delimiter survives
    val p = writeCsv("a,b,c\n,\"\",\"x,y\"\n1,\"\",z\n")
    val df = CsvIngest.readCsv(spark, p)
    val rows = df.orderBy("c").collect()
    assert(df.filter(df("b").isNull).count() == 2, "quoted empty -> null")
    assert(rows(0).isNullAt(0) && rows(0).getString(2) == "x,y")
    assert(rows(1).getLong(0) == 1L)
  }

  test("explicit delimiter and quote char (pandas sep=';' quotechar=\"'\")") {
    val p = writeCsv("a;b;c\n1;'x;y';2024-01-01 10:00:00\n2;plain;\n")
    val df = CsvIngest.readCsv(spark, p, delimiter = ";", quote = "'")
    assert(df.schema("a").dataType == LongType)
    assert(df.schema("c").dataType == TimestampType) // inference intact
    val byA = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byA(1L).getString(1) == "x;y") // quoted delimiter not split
    assert(byA(2L).getString(1) == "plain" && byA(2L).isNullAt(2))
  }

  test("explicit encoding: ISO-8859-1 bytes round-trip (pandas " +
      "encoding='latin-1')") {
    val f = Files.createTempFile("graft-csv", ".csv")
    Files.write(f, "k,s\n1,café\n2,über\n"
      .getBytes("ISO-8859-1"))
    // read as UTF-8 those bytes would mojibake/fail; the option must
    // reach the parser
    val df = CsvIngest.readCsv(spark, f.toString,
      encoding = "ISO-8859-1")
    assert(df.select("s").collect().map(_.getString(0)).toSet ==
      Set("café", "über"))
  }

  test("listByMtimeDesc orders newest first") {
    val dir = Files.createTempDirectory("graft-mtime")
    Seq(("a.csv", 1000L), ("b.csv", 3000L), ("c.csv", 2000L)).foreach {
      case (n, t) =>
        val p = dir.resolve(n)
        Files.write(p, "x\n1\n".getBytes)
        p.toFile.setLastModified(1700000000000L + t)
    }
    val names = CsvIngest.listByMtimeDesc(spark, s"$dir/*.csv")
      .map(_.split('/').last)
    assert(names == Seq("b.csv", "c.csv", "a.csv"))
  }

  test("ckanType 4-way mapping") {
    assert(CsvIngest.ckanType(LongType) == "int")
    assert(CsvIngest.ckanType(DoubleType) == "float")
    assert(CsvIngest.ckanType(TimestampType) == "timestamp")
    assert(CsvIngest.ckanType(StringType) == "text")
    assert(CsvIngest.ckanType(BooleanType) == "text") // fallback
  }

  test("compaction collapses fragments and preserves row content exactly") {
    import sqlImplicits._
    import graft.ingest.Compaction
    val base = Files.createTempDirectory("graft-compact")
    val frag = s"$base/frag"; val out = s"$base/out"
    (1 to 1000).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
      .repartition(16).write.parquet(frag)
    assert(Compaction.fileCount(spark, frag) == 16)
    // huge target -> everything fits one file
    assert(Compaction.compact(spark, frag, out, targetBytes = 1L << 30) == 1)
    assert(Compaction.fileCount(spark, out) == 1)
    assert(spark.read.parquet(out).as[(Long, Double)].collect().sorted.toSeq ==
      (1 to 1000).map(i => (i.toLong, i * 1.5)))
    // tiny target -> proportional file count from the FS listing
    val bytes = Compaction.dataBytes(spark, frag)
    val n = Compaction.compact(spark, frag, s"$base/out2", bytes / 4 + 1)
    assert(n >= 3 && n <= 4 && Compaction.fileCount(spark, s"$base/out2") == n)
  }

  test("readCsvQuarantine splits clean rows from malformed, keeping the " +
      "raw line for the repair queue") {
    val p = writeCsv(
      "k,v\n" +
        "1,1.5\n" +          // clean
        "2,oops\n" +         // bad: unparseable double
        "3\n" +              // bad: short row
        "4,\n")              // clean: null v
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val (good, bad) = CsvIngest.readCsvQuarantine(spark, p, schema)
    import sqlImplicits._
    assert(good.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // quarantine preserves the offending lines verbatim
    val raw = bad.as[String].collect().toSet
    assert(raw == Set("2,oops", "3"))
  }
}
