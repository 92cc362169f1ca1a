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
}
