package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`). Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown: predicate pushdown,
  * column pruning and (on a real cluster) partition pruning all reach the
  * scan for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable; required to read INT64 TIMESTAMP(NANOS) parquet
      // regardless of how the calling session was built.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** events.ts has shipped as two parquet encodings across testdata
    * generations:
    *  - INT64 TIMESTAMP(NANOS): Spark 4 only reads it with
    *    spark.sql.legacy.parquet.nanosAsLong=true (as a raw long) —
    *    convert to a µs TimestampType with integer division; DuckDB's
    *    ns→µs cast truncates the same way, keeping oracle parity.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
    *    TIMESTAMP_NTZ, which unix_micros/unix_seconds and stream windowing
    *    reject — cast to TimestampType. All graft sessions pin
    *    spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *    and matches DuckDB's naive-timestamp epoch math.
    */
  private def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr(s"$c div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, df(c).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
