package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}
