package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectCount

/** SortedIntersectCount: pinned against array_intersect on random
  * distinct sorted string arrays (the producer contract in TextDedupe).
  */
class SortedIntersectSpec extends SparkSpec {

  test("merge count equals array_intersect size on sorted distinct arrays") {
    import sqlImplicits._
    val rnd = new scala.util.Random(11)
    def arr(): Seq[String] =
      rnd.shuffle((0 until 2000).toList).take(rnd.nextInt(80) + 5)
        .map(i => s"tok$i").distinct
    val df = Seq.tabulate(300)(i => (i.toLong, arr(), arr()))
      .toDF("id", "a", "b")
      .select(col("id"), sort_array(col("a")).as("a"),
        sort_array(col("b")).as("b"))
      .withColumn("mc", SortedIntersectCount.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("mc") =!= col("ref")).count() == 0)
    // non-vacuous: some rows intersect
    assert(df.filter(col("mc") > 0).count() > 0)
  }

  test("empty and disjoint arrays count zero; null propagates") {
    import sqlImplicits._
    val df = Seq(
      (Some(Seq[String]()), Some(Seq("a", "b"))),
      (Some(Seq("a")), Some(Seq("b"))),
      (None, Some(Seq("a"))))
      .toDF("a", "b")
      .withColumn("mc", SortedIntersectCount.sortedIntersectCount(col("a"), col("b")))
    assert(df.filter(col("mc") === 0).count() == 2)
    assert(df.filter(col("mc").isNull).count() == 1)
  }
}
