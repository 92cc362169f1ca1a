package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("scrubPii redacts emails and phones and counts them") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@mail.example.org today"),
      (2L, "call +1-555-0199 or 44-555-0000 now"),
      (3L, "no pii here at all"),
      (4L, "a@b.io and +1-555-1234 both")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(got(1L) == (("reach me at <EMAIL> today", 1)))
    assert(got(2L) == (("call <PHONE> or <PHONE> now", 2)))
    assert(got(3L) == (("no pii here at all", 0)))
    assert(got(4L) == (("<EMAIL> and <PHONE> both", 2)))
  }

  test("curate: every rule fires, in precedence order, and dups keep " +
      "the min id") {
    val en = "the quick brown fox jumps over one lazy dog and a cat " +
      "sitting near the old barn watching birds fly south for winter"
    val docs = Seq(
      (1L, en),                        // keep
      (2L, "xyzzy plugh foo"),         // lang (und) — also too_short, lang wins
      (3L, "the and of"),              // en but 3 tokens -> too_short
      (4L, ("the of " + Seq.fill(60)("and").mkString(" "))), // low diversity -> quality
      (5L, en.toUpperCase),            // normalizes differently? no — uppercase: lang regex misses lowercase stopwords -> lang
      (6L, "  " + en + "  "),          // whitespace-normalized dup of 1 -> duplicate
      (7L, ("the of and " + (1 to 95).map("w" + _).mkString(" ")))  // 98 tokens > 90 -> too_long
    ).toDF("doc_id", "text")
    val got = TextOps.curate(docs, "doc_id", "text",
      minTokens = 5, maxTokens = 90, minQuality = 0.58)
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((None, true)))
    assert(got(2L) == ((Some("lang"), false)))   // lang precedes too_short
    assert(got(3L) == ((Some("too_short"), false)))
    assert(got(4L) == ((Some("quality"), false)))
    assert(got(5L) == ((Some("lang"), false)))
    assert(got(6L) == ((Some("duplicate"), false))) // 1 keeps, 6 rejects
    assert(got(7L) == ((Some("too_long"), false)))
  }
}
