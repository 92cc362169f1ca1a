package graft

import org.apache.spark.sql.functions._
import graft.ops.Timestamps

class TimestampsSpec extends SparkSpec {
  import sqlImplicits._

  private def parse(s: String): Option[java.time.LocalDateTime] = {
    val r = Seq(s).toDF("raw")
      .select(Timestamps.parseTs(col("raw")).cast("string")).collect()
      .head
    if (r.isNullAt(0)) None
    else Some(java.time.LocalDateTime.parse(r.getString(0).replace(' ', 'T')))
  }

  test("fuzzy tier recovers formats the declared chain does not") {
    val expectDay = java.time.LocalDateTime.of(2024, 3, 5, 0, 0, 0)
    val expectSec = java.time.LocalDateTime.of(2024, 3, 5, 10, 30, 45)
    assert(parse("2024-03-05").contains(expectDay))       // ISO date-only
    assert(parse("03/05/2024").contains(expectDay))       // US month-first
    assert(parse("05.03.2024").contains(expectDay))       // EU dotted
    assert(parse("2024/03/05").contains(expectDay))       // slashed ISO
    assert(parse("20240305").contains(expectDay))         // basic compact
    assert(parse("05 Mar 2024").contains(expectDay))      // month name
    assert(parse("Mar 05, 2024").contains(expectDay))     // US month name
    assert(parse("March 05, 2024").contains(expectDay))   // full month name
    assert(parse("2024/03/05 10:30:45").contains(expectSec))
    assert(parse("2024-03-05 10:30").contains(
      java.time.LocalDateTime.of(2024, 3, 5, 10, 30, 0)))
    assert(parse("2024-03-05 10:30:45.123").contains(
      java.time.LocalDateTime.of(2024, 3, 5, 10, 30, 45, 123000000)))
  }

  test("declared formats take precedence and garbage yields null, " +
      "not an error") {
    // month-first declared order wins over the EU dotted fuzzy entry for
    // strings both could claim
    assert(parse("01/02/2024 00:00:00").contains(
      java.time.LocalDateTime.of(2024, 1, 2, 0, 0, 0)))
    assert(parse("not a date").isEmpty)
    assert(parse("3 days ago").isEmpty) // documented deviation: no NL dates
  }

  test("oracle chain is generated from the same table (order parity)") {
    val sql = Timestamps.parseTsOracleSql("x")
    val sparkOrder = Timestamps.DeclaredFormats.map(_._2) ++
      Timestamps.FuzzyFormats.map(_._2)
    // every duck pattern appears, in the same order
    val positions = sparkOrder.map(p => sql.indexOf(s"'$p'"))
    assert(positions.forall(_ >= 0) && positions == positions.sorted)
  }

  private def parseNl(s: String): Option[String] = {
    val r = Seq(s).toDF("raw")
      .select(Timestamps.parseTsNl(col("raw"),
        to_date(lit("2024-06-15"))).cast("string")).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("NL tier: relative words resolve against the pinned anchor; " +
      "flag-off chain is untouched") {
    assert(parseNl("yesterday").contains("2024-06-14 00:00:00"))
    assert(parseNl(" Today ").contains("2024-06-15 00:00:00")) // fold+trim
    assert(parseNl("TOMORROW").contains("2024-06-16 00:00:00"))
    assert(parseNl("05 March 2024").contains("2024-03-05 00:00:00"))
    // NL entry point still runs the full standard chain after its tiers
    assert(parseNl("2024-03-05 10:30:45").contains("2024-03-05 10:30:45"))
    assert(parseNl("not a date").isEmpty)
    // the default chain (flag off) must NOT see relative words — the
    // documented-deviation contract of the existing entries holds
    assert(parse("yesterday").isEmpty)
    assert(parse("05 March 2024").isEmpty)
  }
}
