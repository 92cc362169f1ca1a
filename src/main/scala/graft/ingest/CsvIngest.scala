package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion parity with the reference (`datapump.py:421-444`):
  * glob → newest-first file ordering → header CSV read with
  * empty-string-as-null and leading-whitespace stripping → multi-format
  * timestamp parsing → 4-type coarsening.
  */
object CsvIngest {

  /** The reference's default date format list (`datapump.py:89-92`),
    * expressed as Spark datetime patterns, tried in order. */
  val DefaultFormats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss",
    "dd.MM.yyyy HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss")

  /** Ordered-fallback multi-format parse (the dateparser loop,
    * `datapump.py:439-444`, minus its fuzzy tier — SURVEY §2.8). Each
    * attempt is shape-gated (`Timestamps.guardedTryTs`): a failed
    * `try_to_timestamp` is exception-based control flow, ~100× a regex
    * miss, and inference runs this chain over every string column. */
  def parseTs(c: Column, formats: Seq[String] = DefaultFormats): Column =
    coalesce(formats.map(f => graft.ops.Timestamps.guardedTryTs(c, f)): _*)

  /** Files matching a glob, newest mtime first — the reference's
    * processing order (`datapump.py:426`). Listing happens on the driver
    * (file metadata only); the data read stays distributed. */
  def listByMtimeDesc(spark: SparkSession, glob: String): Seq[String] = {
    val path = new Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(path)).getOrElse(Array.empty)
    statuses.filter(_.isFile)
      .sortBy(-_.getModificationTime)
      .map(_.getPath.toString).toSeq
  }

  /** Read one CSV file with the reference's read options
    * (`datapump.py:442-444`: header, skipinitialspace, na_values='').
    * Schema is inferred, then coarsened (int→long, float→double) and
    * string columns that fully parse as timestamps become timestamps
    * (all-or-nothing per column, `datapump.py:149-166`).
    *
    * `delimiter`/`quote`/`encoding` mirror pandas `read_csv`'s
    * `sep`/`quotechar`/`encoding` (defaults identical: comma, double
    * quote, UTF-8). Null parity with `na_values=''`: BOTH the bare empty
    * field (`a,,b`) and the quoted empty field (`a,"",b`) read as null —
    * pandas' default NaN set contains the empty string whichever way it
    * was quoted, so `emptyValue` is pinned to null-producing behavior
    * here (CsvIngestSpec locks this corner). */
  def readCsv(spark: SparkSession, path: String,
      formats: Seq[String] = DefaultFormats,
      delimiter: String = ",", quote: String = "\"",
      encoding: String = "UTF-8",
      multiLine: Boolean = false): DataFrame = {
    val raw = spark.read
      .option("header", true)
      .option("ignoreLeadingWhiteSpace", true)
      .option("nullValue", "")
      // quoted empty ("") must ALSO be null (pandas na_values=''):
      // Spark's univocity reader routes quoted-empty through emptyValue
      // (default: empty string), a separate knob from nullValue
      .option("emptyValue", null: String)
      .option("inferSchema", true)
      .option("sep", delimiter)
      .option("quote", quote)
      .option("encoding", encoding)
      // quoted embedded newlines (pandas reads them by default; Spark
      // needs the flag). SCALE TRADEOFF, documented: multiLine makes a
      // CSV file non-splittable (a record can straddle any line break),
      // so parallelism degrades to the FILE level — same unit as the
      // xlsx/avro readers, fine for drop-folder many-file layouts, wrong
      // for one giant file. Default off: line-splittable fast path.
      .option("multiLine", multiLine)
      .csv(path)
    inferTypes(raw, formats)
  }

  /** Schema-pinned CSV read with ROW-LEVEL quarantine — the Spark-native
    * refinement of the reference's whole-file `problems/` move
    * (`datapump.py:648`): instead of failing the entire file on one bad
    * row, PERMISSIVE mode parses what it can, captures each malformed
    * line verbatim in a corrupt-record column, and the result splits into
    * a clean frame and a quarantine frame (raw line kept for the repair
    * queue). A malformed row = wrong token count or an unparseable typed
    * field; well-formed rows with empty fields are clean nulls, not
    * quarantine. Map-only — quarantine adds no shuffle at any scale. */
  def readCsvQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema
      .add("__raw", org.apache.spark.sql.types.StringType)
    val df = spark.read
      .option("header", true)
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__raw")
      .schema(withCorrupt)
      .csv(path)
      // corrupt-record columns cannot be filtered on a lazily-parsed
      // plan without materialization; cache scopes the parse
      .cache()
    try {
      // eager localCheckpoint: both halves materialize off the cached
      // parse NOW, so the cache entry can be released before returning
      // (repeated calls — bench warmup + timed, verify — no longer
      // accumulate session-lifetime cache entries); checkpoint blocks are
      // reclaimed by the ContextCleaner when the frames go unreferenced
      val good = df.filter(col("__raw").isNull).drop("__raw")
        .localCheckpoint()
      val bad = df.filter(col("__raw").isNotNull).select(col("__raw"))
        .localCheckpoint()
      (good, bad)
    } finally df.unpersist()
  }

  /** The 4-type coarsening + all-or-nothing string→timestamp inference.
    * One aggregation pass decides every string column at once (non-null
    * count vs parse-success count), then a single projection applies the
    * casts — two jobs total regardless of column count. */
  def inferTypes(df: DataFrame, formats: Seq[String] = DefaultFormats)
      : DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq
    val tsCols: Set[String] =
      if (stringCols.isEmpty) Set.empty
      else {
        val aggs = stringCols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}__nn"),
            count(parseTs(col(c), formats)).as(s"${c}__ts"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        stringCols.filter { c =>
          val nn = row.getAs[Long](s"${c}__nn")
          nn > 0 && row.getAs[Long](s"${c}__ts") == nn
        }.toSet
      }
    val projected = df.schema.fields.map { f =>
      f.dataType match {
        case StringType if tsCols(f.name) =>
          parseTs(col(f.name), formats).as(f.name)
        case IntegerType | ShortType | ByteType =>
          col(f.name).cast(LongType).as(f.name)
        case FloatType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** CKAN-style 4-type name for a Spark type (`get_col_dtype`,
    * `datapump.py:149-166`) — the schema IR the sink DDL consumes. */
  def ckanType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType => "float"
    case TimestampType => "timestamp"
    case _ => "text"
  }
}
