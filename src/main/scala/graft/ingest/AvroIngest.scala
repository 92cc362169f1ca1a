package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingestion built directly on avro-core (already on
  * Spark's runtime classpath) — the offline build has no spark-avro
  * connector, and the interchange subset below doesn't need one.
  *
  * Scope (documented, honest): FLAT records of nullable primitives
  * (long / int / double / float / boolean / string), the shape CSV/JSONL
  * interchange produces. Nested records, maps, arrays, and logical
  * types are out of scope — parquet is the engine's nested format.
  *
  * Scale shape: the WRITER lands one container file per partition (the
  * distributed landing layout — no driver collect); the READER decodes
  * whole files (`binaryFile` → `DataFileStream` per file), so the unit
  * of read parallelism is the FILE, like the xlsx path — the right
  * shape for many-files drop-folder ingestion. Avro blocks inside one
  * file are split-readable in principle; that refinement only matters
  * for single-giant-file layouts, which the writer never produces.
  */
object AvroIngest {

  private def avroSchemaJson(schema: StructType): String = {
    val fields = SchemaBuilder.record("row").namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val b = fs.name(f.name).`type`()
      f.dataType match {
        case LongType    => b.unionOf().nullType().and().longType().endUnion().nullDefault()
        case IntegerType => b.unionOf().nullType().and().intType().endUnion().nullDefault()
        case DoubleType  => b.unionOf().nullType().and().doubleType().endUnion().nullDefault()
        case FloatType   => b.unionOf().nullType().and().floatType().endUnion().nullDefault()
        case BooleanType => b.unionOf().nullType().and().booleanType().endUnion().nullDefault()
        case StringType  => b.unionOf().nullType().and().stringType().endUnion().nullDefault()
        case dt => throw new IllegalArgumentException(
          s"AvroIngest scope is flat nullable primitives; ${f.name} is $dt")
      }
    }.endRecord().toString
  }

  /** One Avro container file per partition under `dir`. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val avroSchema = new Schema.Parser().parse(schemaJson)
        val conf = new org.apache.hadoop.conf.Configuration()
        val part = TaskContext.getPartitionId()
        val p = new Path(s"$dir/part-$part.avro")
        val out = p.getFileSystem(conf).create(p, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, out)
        try rows.foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), r.get(i)); i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  private def sparkType(s: Schema): DataType = {
    // unwrap the nullable union written above
    val t = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException("union of only null"))
    else s
    t.getType match {
      case Schema.Type.LONG    => LongType
      case Schema.Type.INT     => IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING  => StringType
      case other => throw new IllegalArgumentException(
        s"AvroIngest scope is flat nullable primitives; got $other")
    }
  }

  /** Read a directory/glob of container files; the schema comes from
    * the first file's header, and every other file must carry an
    * identical record schema (drift → error naming the file). */
  def readAvro(spark: SparkSession, glob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select("path", "content")
    val first = files.select("path", "content").limit(1).collect()
    require(first.nonEmpty, s"no avro files match $glob")
    val headerSchema = {
      val s = new DataFileStream[GenericRecord](
        new java.io.ByteArrayInputStream(first(0).getAs[Array[Byte]](1)),
        new GenericDatumReader[GenericRecord]())
      try s.getSchema.toString finally s.close()
    }
    val fieldSchemas = new Schema.Parser().parse(headerSchema)
      .getFields.asScala.toSeq
    val sparkSchema = StructType(fieldSchemas.map(f =>
      StructField(f.name, sparkType(f.schema()))))
    val names = fieldSchemas.map(_.name)
    val rows = files.rdd.flatMap { r =>
      val path = r.getString(0)
      val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      require(stream.getSchema.toString == headerSchema,
        s"avro schema drift in $path")
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try stream.forEach { rec =>
        out += Row.fromSeq(names.map { n =>
          rec.get(n) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v => v
          }
        })
      } finally stream.close()
      out
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
