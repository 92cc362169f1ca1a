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
}
