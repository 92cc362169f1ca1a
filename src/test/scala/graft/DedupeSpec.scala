package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedupe

class DedupeSpec extends SparkSpec {
  import sqlImplicits._

  private def frame() = Seq(
    // (pk, order, payload) — pk "a" has 3 versions, "b" 2, "c" 1
    ("a", 1L, "a-v1"), ("b", 2L, "b-v1"), ("a", 3L, "a-v2"),
    ("c", 4L, "c-v1"), ("a", 5L, "a-v3"), ("b", 6L, "b-v2")
  ).toDF("pk", "ord", "payload").repartition(4) // force multi-partition

  test("keepFirst keeps earliest arrival per PK across partitions") {
    val got = Dedupe.keepFirst(frame(), Seq("pk"), col("ord"))
      .select("pk", "payload").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a-v1", "b" -> "b-v1", "c" -> "c-v1"))
  }

  test("keepLast keeps latest arrival per PK across partitions") {
    val got = Dedupe.keepLast(frame(), Seq("pk"), col("ord"))
      .select("pk", "payload").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a-v3", "b" -> "b-v2", "c" -> "c-v1"))
  }

  test("dedupe is idempotent") {
    val once = Dedupe.keepLast(frame(), Seq("pk"), col("ord"))
    val twice = Dedupe.keepLast(once, Seq("pk"), col("ord"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("dupeCountDf counts total minus distinct PKs") {
    val n = Dedupe.dupeCountDf(frame(), Seq("pk"))
      .as[Long].collect()(0)
    assert(n == 3) // 6 rows - 3 distinct pks
  }

  test("withArrivalOrder is strictly increasing in file order") {
    // single-partition read: monotonically_increasing_id preserves order
    val df = Seq("r1", "r2", "r3").toDF("v").coalesce(1)
    val ords = Dedupe.withArrivalOrder(df).select("__arrival")
      .as[Long].collect()
    assert(ords.sorted.sameElements(ords) && ords.distinct.length == 3)
  }
}
