package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed join on co-bucketed tables plans with NO Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (1L, 11.0)).toDF("k", "v")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/a").saveAsTable("spec_bucket_a")
    Seq((1L, "x"), (2L, "y"), (4L, "z")).toDF("k", "name")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .option("path", s"$dir/b").saveAsTable("spec_bucket_b")
    val joined = spark.table("spec_bucket_a").hint("merge")
      .join(spark.table("spec_bucket_b"), "k")
    // co-located + co-sorted buckets: the SortMergeJoin reads both sides
    // directly — no shuffle, no sort, at ANY table size
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(joined.count() == 3) // k=1 twice, k=2 once
    spark.sql("DROP TABLE spec_bucket_a")
    spark.sql("DROP TABLE spec_bucket_b")
  }

  test("asOfJoin picks latest right row at or before left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // exactly at a right row
      (3L, 10L, ts("2023-12-31 00:00:00")), // before all right rows
      (4L, 20L, ts("2024-06-01 00:00:00"))
    ).toDF("id", "key", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (10L, ts("2024-01-03 00:00:00"), 101L, 2.0),
      (20L, ts("2024-01-02 00:00:00"), 200L, 3.0)
    ).toDF("rkey", "rts", "rid", "rv")

    val got = Joins.asOfJoin(left, right,
      leftKey = "key", rightKey = "rkey", leftTs = "ts", rightTs = "rts",
      rightTieBreak = "rid", rightValueCols = Seq("rid", "rv"))
      .select("id", "asof_rid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got(1L) == Some(101L)) // latest <= 01-05 is 01-03
    assert(got(2L) == Some(100L)) // inclusive at equal instant
    assert(got(3L) == None)       // nothing prior -> null
    assert(got(4L) == Some(200L))
  }

  test("asOfJoin breaks ts ties by greatest tie-break column") {
    val left = Seq((1L, 10L, ts("2024-01-02 00:00:00"))).toDF("id", "key", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 7L, 1.0),
      (10L, ts("2024-01-01 00:00:00"), 9L, 2.0), // same ts, higher id wins
      (10L, ts("2024-01-01 00:00:00"), 8L, 3.0)
    ).toDF("rkey", "rts", "rid", "rv")
    val got = Joins.asOfJoin(left, right, "key", "rkey", "ts", "rts",
      "rid", Seq("rid"))
      .select("asof_rid").as[Long].collect()
    assert(got.sameElements(Array(9L)))
  }

  test("asOfJoin pandas options: allow_exact_matches=false excludes the " +
      "same instant; tolerance nulls out-of-bound matches per direction") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // exact right match exists
      (2L, 10L, ts("2024-01-07 00:00:00"))  // 2 days after latest right
    ).toDF("id", "key", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (10L, ts("2024-01-05 00:00:00"), 2L, 2.0)
    ).toDF("rkey", "rts", "rid", "rv")
    def run(exact: Boolean, tolMicros: Option[Long], dir: String = "backward") =
      Joins.asOfJoin(left, right, "key", "rkey", "ts", "rts", "rid",
        Seq("rid"), direction = dir, allowExactMatches = exact,
        toleranceMicros = tolMicros)
        .select("id", "asof_rid").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // strict: the 01-05 left row skips the same-instant right, takes 01-01
    assert(run(exact = false, None) ==
      Map(1L -> Some(1L), 2L -> Some(2L)))
    // tolerance 1 day: left row 2 is 2 days past its match -> null;
    // left row 1 matches at distance 0
    val day = 86400L * 1000000L
    assert(run(exact = true, Some(day)) == Map(1L -> Some(2L), 2L -> None))
    // nearest + tolerance: candidates filtered per side BEFORE the pick —
    // backward (2 days) out of bound, no forward candidate -> null
    assert(run(exact = true, Some(day), dir = "nearest")(2L).isEmpty)
    // strict + nearest: exact-instant candidate excluded, row 1 falls
    // back to the 01-01 backward candidate (4 days)
    assert(run(exact = false, None, dir = "nearest")(1L) == Some(1L))
  }

  test("asOfJoin carries the chosen right row ATOMICALLY: a null value " +
      "column stays null, never back-filled from an older right row") {
    val left = Seq((1L, 10L, ts("2024-01-10 00:00:00")))
      .toDF("id", "key", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, Option(1.5)),
      // the chosen (latest <= left) row has a NULL value column
      (10L, ts("2024-01-05 00:00:00"), 2L, Option.empty[Double])
    ).toDF("rkey", "rts", "rid", "rv")
    for (dir <- Seq("backward", "nearest")) {
      val row = Joins.asOfJoin(left, right, "key", "rkey", "ts", "rts",
        "rid", Seq("rid", "rv"), direction = dir)
        .select("asof_rid", "asof_rv").collect().head
      assert(row.getLong(0) == 2L, dir)
      assert(row.isNullAt(1), s"$dir: null rv must not back-fill from rid=1")
    }
  }

  test("asOfJoin forward/nearest directions: inclusivity, null on no " +
      "candidate, nearest prefers backward on exact-distance tie") {
    val left = Seq(
      (1L, 10L, ts("2024-01-02 00:00:00")), // between 01-01 and 01-05
      (2L, 10L, ts("2024-01-05 00:00:00")), // exact forward match
      (3L, 10L, ts("2024-01-09 00:00:00")), // nothing after -> fwd null
      (4L, 10L, ts("2024-01-03 00:00:00"))  // equidistant 01-01/01-05
    ).toDF("id", "key", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L),
      (10L, ts("2024-01-05 00:00:00"), 101L)
    ).toDF("rkey", "rts", "rid")
    def run(dir: String): Map[Long, Option[Long]] =
      Joins.asOfJoin(left, right, "key", "rkey", "ts", "rts",
        "rid", Seq("rid"), direction = dir)
        .select("id", "asof_rid")
        .collect().map(r => (r.getLong(0), Option(r.get(1))
          .map(_.asInstanceOf[Long]))).toMap
    val fwd = run("forward")
    assert(fwd(1L) == Some(101L)) // earliest >= 01-02
    assert(fwd(2L) == Some(101L)) // inclusive at equal instant
    assert(fwd(3L) == None)       // nothing after -> null
    val near = run("nearest")
    assert(near(1L) == Some(100L)) // 1 day back vs 3 days fwd
    assert(near(2L) == Some(101L)) // exact match
    assert(near(3L) == Some(101L)) // only backward exists
    assert(near(4L) == Some(100L)) // 2d == 2d tie -> backward
  }

  test("asOfJoin hot key: history spreads across time chunks instead of " +
      "one task, and cross-chunk boundary carry keeps results exact") {
    // One key holds 90% of rows spread over ~40 days; with 1-day chunks
    // the hot key's window work splits into ~40 groups instead of one.
    val base = ts("2024-01-01 00:00:00").getTime
    val hour = 3600L * 1000L
    val leftRows = (0 until 900).map { i =>
      (i.toLong, 1L, new Timestamp(base + i * hour))
    } ++ (900 until 1000).map { i =>
      (i.toLong, 2L, new Timestamp(base + (i - 900) * hour))
    }
    // right rows every 7 hours, deliberately sparse so many chunks have
    // left rows but no in-chunk right row (exercises the boundary carry)
    val rightRows = (0 until 130).map { j =>
      (1L, new Timestamp(base + j * 7 * hour), j.toLong, j * 1.0)
    } ++ Seq((2L, new Timestamp(base + 5 * hour), 1000L, -1.0))
    val left = leftRows.toDF("id", "key", "ts")
    val right = rightRows.toDF("rkey", "rts", "rid", "rv")

    // brute-force oracle per direction
    def brute(dir: String): Map[Long, Option[Long]] =
      leftRows.map { case (id, k, t) =>
        val cands = rightRows.filter(_._1 == k)
        val back = cands.filter(_._2.getTime <= t.getTime)
          .sortBy(c => (c._2.getTime, c._3)).lastOption
        val fwd = cands.filter(_._2.getTime >= t.getTime)
          .sortBy(c => (-c._2.getTime, c._3)).lastOption
        val pick = dir match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (t.getTime - b._2.getTime <= f._2.getTime - t.getTime)
                Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        id -> pick.map(_._3)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = Joins.asOfJoin(left, right, "key", "rkey", "ts", "rts",
        "rid", Seq("rid", "rv"), direction = dir)
        .select("id", "asof_rid")
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toMap
      assert(got == brute(dir), s"direction=$dir")
    }

    // Skew evidence: the per-(key, chunk) group that the carry window
    // partitions by is bounded — the hot key's 900+130 rows split into
    // ~39 day-chunks, max group ≈ 24+4 rows, never the whole history.
    val chunked = left.select(col("key"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).as("chunk"))
      .unionByName(right.select(col("rkey").as("key"),
        floor(unix_micros(col("rts")) / lit(86400000000L)).as("chunk")))
      .groupBy("key", "chunk").count()
    val hotGroups = chunked.filter(col("key") === 1L)
    assert(hotGroups.count() >= 35, "hot key must span many chunk groups")
    val maxGroup = hotGroups.agg(max("count")).as[Long].head()
    assert(maxGroup <= 40,
      s"max per-(key,chunk) group must be day-bounded, got $maxGroup")
  }

  test("temporal join: half-open versions, open tail, unmatched facts") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, "v1", ts("2024-01-01 00:00:00"), Some(ts("2024-01-15 00:00:00"))),
      (1L, "v2", ts("2024-01-15 00:00:00"), None),
      (2L, "only", ts("2024-01-10 00:00:00"), None))
      .toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, ts("2024-01-14 23:59:59")), // inside v1
      (11L, 1L, ts("2024-01-15 00:00:00")), // boundary instant -> v2
      (12L, 1L, ts("2023-12-31 00:00:00")), // before first version
      (13L, 2L, ts("2024-02-01 00:00:00")), // open tail
      (14L, 9L, ts("2024-01-20 00:00:00"))) // unknown key
      .toDF("event_id", "k", "ts")
    val got = graft.ops.Joins
      .temporalJoin(facts, dim, "k", "k", "ts")
      .select(col("event_id"), col("seg"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(10L -> Some("v1"), 11L -> Some("v2"),
      12L -> None, 13L -> Some("only"), 14L -> None))
  }
}
