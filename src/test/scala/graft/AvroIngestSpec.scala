package graft

import graft.ingest.AvroIngest

class AvroIngestSpec extends SparkSpec {
  import sqlImplicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-avro").toString

  test("round trip: nullable primitives, multiple partitions") {
    val dir = tmpDir()
    val df = Seq[(Long, Option[String], Option[Double], Boolean)](
      (1L, Some("a"), Some(1.5), true),
      (2L, None, Some(-2.25), false),
      (3L, Some("c"), None, true))
      .toDF("k", "s", "v", "b").repartition(2)
    AvroIngest.writeAvro(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 2) // one container file per partition
    val back = AvroIngest.readAvro(spark, s"$dir/part-*.avro")
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSet ==
      Set(("k", "long"), ("s", "string"), ("v", "double"), ("b", "boolean")))
    assert(back.as[(Long, Option[String], Option[Double], Boolean)]
      .collect().toSet ==
      Set((1L, Some("a"), Some(1.5), true),
        (2L, None, Some(-2.25), false),
        (3L, Some("c"), None, true)))
  }

  test("int and float survive with their own types") {
    val dir = tmpDir()
    val df = Seq((1, 2.5f), (2, -0.5f)).toDF("i", "f")
    AvroIngest.writeAvro(df, dir)
    val back = AvroIngest.readAvro(spark, s"$dir/part-*.avro")
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSet ==
      Set(("i", "integer"), ("f", "float")))
    assert(back.as[(Int, Float)].collect().toSet == Set((1, 2.5f), (2, -0.5f)))
  }

  test("schema drift across files errors naming the file") {
    val dir = tmpDir()
    AvroIngest.writeAvro(Seq((1L, "a")).toDF("k", "s").coalesce(1), dir)
    val other = tmpDir()
    AvroIngest.writeAvro(Seq((1L, 2L)).toDF("k", "n").coalesce(1), other)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$other/part-0.avro"),
      java.nio.file.Paths.get(s"$dir/part-9.avro"))
    val ex = intercept[org.apache.spark.SparkException] {
      AvroIngest.readAvro(spark, s"$dir/part-*.avro").collect()
    }
    assert(ex.getMessage.contains("schema drift") ||
      Option(ex.getCause).exists(_.getMessage.contains("schema drift")))
  }

  test("out-of-scope types are rejected with a clear message") {
    val dir = tmpDir()
    val df = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    val ex = intercept[IllegalArgumentException] {
      AvroIngest.writeAvro(df, dir)
    }
    assert(ex.getMessage.contains("flat nullable primitives"))
  }
}
