package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins `Tables.events`' timestamp normalization across the parquet
  * encodings the driver's testdata has actually shipped: INT64 nanos
  * (read as raw long under nanosAsLong) through round 8, and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark's TIMESTAMP_NTZ —
  * from round 9 on. The round-9/10 regression (14 entries absent from
  * the driver scoreboard) was exactly this: the loader normalized only
  * the long encoding, and every `unix_micros`/stream-window consumer
  * failed analysis on NTZ. Either way in, consumers must see a plain
  * TimestampType column holding the same instant under the UTC session.
  */
class TablesSpec extends SparkSpec {

  private val micros = 1704067200000000L // 2024-01-01T00:00:00Z

  private def loadEventsFrom(schemaDir: java.io.File): org.apache.spark.sql.DataFrame =
    Tables.events(spark, schemaDir.toString)

  test("events.ts as raw INT64 nanos normalizes to µs TimestampType") {
    val dir = Files.createTempDirectory("graft_tables_nanos").toFile
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, micros * 1000L + 999L)), // sub-µs truncates
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType))))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = loadEventsFrom(dir)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select("ts").head.getTimestamp(0)
    assert(got.getTime == micros / 1000L) // ms precision of the instant
  }

  test("events.ts as TIMESTAMP_NTZ micros normalizes to the same instant") {
    val dir = Files.createTempDirectory("graft_tables_ntz").toFile
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, LocalDateTime.of(2024, 1, 1, 0, 0, 0))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType))))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType) // fixture honest
    val out = loadEventsFrom(dir)
    assert(out.schema("ts").dataType == TimestampType)
    // UTC session: naive 2024-01-01T00:00 IS the epoch instant above
    assert(out.select("ts").head.getTimestamp(0) ==
      new Timestamp(micros / 1000L))
    // the round-9 failure mode: unix_micros must analyze and agree
    import org.apache.spark.sql.functions.unix_micros
    assert(out.select(unix_micros(out("ts"))).head.getLong(0) == micros)
  }

  test("events.ts already TimestampType passes through unchanged") {
    val dir = Files.createTempDirectory("graft_tables_tz").toFile
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, new Timestamp(micros / 1000L))),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType))))
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = loadEventsFrom(dir)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select("ts").head.getTimestamp(0) ==
      new Timestamp(micros / 1000L))
  }
}
