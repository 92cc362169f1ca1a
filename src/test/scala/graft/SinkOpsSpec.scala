package graft

import graft.sink.SinkOps

class SinkOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("upsert: incoming wins on PK conflict, old non-conflicts survive") {
    val old = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("k", "v")
    val neu = Seq((2, "new2"), (4, "new4")).toDF("k", "v")
    val got = SinkOps.logicalUpsert(old, neu, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "old1"), (2, "new2"), (3, "old3"), (4, "new4")))
  }

  test("upsert with empty incoming is identity") {
    val old = Seq((1, "a")).toDF("k", "v")
    val neu = old.filter($"k" > 99)
    val got = SinkOps.logicalUpsert(old, neu, Seq("k")).collect().toSet
    assert(got == old.collect().toSet)
  }

  test("upsert is idempotent") {
    val old = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val neu = Seq((2, "b2")).toDF("k", "v")
    val once = SinkOps.logicalUpsert(old, neu, Seq("k"))
    val twice = SinkOps.logicalUpsert(once, neu, Seq("k"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("composite PK upsert") {
    val old = Seq((1, "x", 10.0), (1, "y", 20.0)).toDF("k1", "k2", "v")
    val neu = Seq((1, "y", 99.0)).toDF("k1", "k2", "v")
    val got = SinkOps.logicalUpsert(old, neu, Seq("k1", "k2"))
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "x", 10.0), (1, "y", 99.0)))
  }

  // --- CDC apply ---

  private def cdc(snap: org.apache.spark.sql.DataFrame,
      chg: org.apache.spark.sql.DataFrame) =
    SinkOps.cdcApply(snap, chg, Seq("k"), Seq("ts", "seq"))
      .as[(Int, String)].collect().toSet

  test("cdc: latest upsert wins, delete removes, untouched passes through") {
    val snap = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val chg = Seq(
      (1, "a1", "U", 1L, 1L), (1, "a2", "U", 2L, 1L),
      (2, null, "D", 1L, 1L),
      (4, "d", "I", 1L, 1L)).toDF("k", "v", "op", "ts", "seq")
    assert(cdc(snap, chg) == Set((1, "a2"), (3, "c"), (4, "d")))
  }

  test("cdc: same-ts seq tie-break and delete-then-resurrect") {
    val snap = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val chg = Seq(
      (1, "x", "U", 1L, 1L), (1, "y", "U", 1L, 2L),
      (2, null, "D", 1L, 1L), (2, "back", "I", 2L, 1L))
      .toDF("k", "v", "op", "ts", "seq")
    assert(cdc(snap, chg) == Set((1, "y"), (2, "back")))
  }

  test("cdc: update-then-delete removes the key") {
    val snap = Seq((1, "a")).toDF("k", "v")
    val chg = Seq((1, "mid", "U", 1L, 1L), (1, null, "D", 2L, 1L))
      .toDF("k", "v", "op", "ts", "seq")
    assert(cdc(snap, chg) == Set.empty[(Int, String)])
  }

  // --- SCD2 ---

  private val t0 = java.sql.Timestamp.valueOf("2023-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")

  private def dim(rows: (Long, String, java.sql.Timestamp,
      Option[java.sql.Timestamp], Boolean)*) =
    rows.toDF("k", "attr", "valid_from", "valid_to", "is_current")

  private def scd2(d: org.apache.spark.sql.DataFrame,
      u: org.apache.spark.sql.DataFrame) =
    SinkOps.scd2Merge(d, u, Seq("k"), Seq("attr"),
      org.apache.spark.sql.functions.lit(t2).cast("timestamp"))
      .as[(Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)].collect().toSet

  test("scd2: changed key closes current version and births a new one") {
    val got = scd2(dim((1L, "a", t1, None, true)),
      Seq((1L, "b")).toDF("k", "attr"))
    assert(got == Set(
      (1L, "a", t1, Some(t2), false),
      (1L, "b", t2, None, true)))
  }

  test("scd2: re-sent identical value is a no-op (no spurious version)") {
    val got = scd2(dim((1L, "a", t1, None, true)),
      Seq((1L, "a")).toDF("k", "attr"))
    assert(got == Set((1L, "a", t1, None, true)))
  }

  test("scd2: unseen key inserts its first open version") {
    val got = scd2(dim((1L, "a", t1, None, true)),
      Seq((9L, "z")).toDF("k", "attr"))
    assert(got == Set(
      (1L, "a", t1, None, true),
      (9L, "z", t2, None, true)))
  }

  test("scd2: closed history passes through untouched") {
    val got = scd2(
      dim((1L, "old", t0, Some(t1), false), (1L, "a", t1, None, true)),
      Seq((1L, "b")).toDF("k", "attr"))
    assert(got == Set(
      (1L, "old", t0, Some(t1), false),
      (1L, "a", t1, Some(t2), false),
      (1L, "b", t2, None, true)))
  }

  test("scd2: null-safe change detection (null->x change, null->null not)") {
    val d = Seq(
      (1L, Option.empty[String], t1, Option.empty[java.sql.Timestamp], true),
      (2L, Option.empty[String], t1, Option.empty[java.sql.Timestamp], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val u = Seq((1L, Some("x")), (2L, Option.empty[String]))
      .toDF("k", "attr")
    val got = SinkOps.scd2Merge(d, u, Seq("k"), Seq("attr"),
      org.apache.spark.sql.functions.lit(t2).cast("timestamp"))
      .as[(Long, Option[String], java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)].collect().toSet
    assert(got == Set(
      (1L, None, t1, Some(t2), false),
      (1L, Some("x"), t2, None, true),
      (2L, None, t1, None, true)))
  }

  test("scd2: key with ONLY closed versions is re-opened by an update, " +
      "not silently dropped") {
    // externally end-dated key: no is_current row at all
    val got = scd2(
      dim((1L, "old", t0, Some(t1), false)),
      Seq((1L, "back")).toDF("k", "attr"))
    assert(got == Set(
      (1L, "old", t0, Some(t1), false),   // history untouched
      (1L, "back", t2, None, true)))      // update births a new version
  }

  test("scd2: dim key untouched by the update batch passes through open") {
    val got = scd2(
      dim((1L, "a", t1, None, true), (2L, "b", t1, None, true)),
      Seq((1L, "a2")).toDF("k", "attr"))
    assert(got == Set(
      (1L, "a", t1, Some(t2), false),
      (1L, "a2", t2, None, true),
      (2L, "b", t1, None, true)))
  }
}
