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
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  /** events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark 4 only reads
    * with spark.sql.legacy.parquet.nanosAsLong=true (as a raw long).
    * Convert to a µs TimestampType with integer division — DuckDB's
    * ns→µs cast truncates the same way, keeping oracle parity.
    */
  private def normalizeNanos(df: DataFrame, c: String): DataFrame =
    if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(c, org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr(s"$c div 1000")))
    else df

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
