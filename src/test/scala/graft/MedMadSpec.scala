package graft

import org.apache.spark.sql.functions._
import graft.functions.MedMadSorted

/** MedMadSorted: [median, MAD] of a long array in one codegen pass —
  * pinned against the composable sort/transform formulation it replaced
  * (Stats.rollingMadOutliers' hot step).
  */
class MedMadSpec extends SparkSpec {

  test("medMad matches sort/transform reference on random windows") {
    import sqlImplicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(25)(rnd.nextInt(20000).toLong - 10000L)))
    val df = rows.toDF("id", "arr")
      .withColumn("mm", MedMadSorted.medMad(col("arr"), 13))
      .withColumn("ref_med", element_at(sort_array(col("arr")), 13))
      .withColumn("ref_mad", element_at(
        sort_array(transform(col("arr"), x => abs(x - col("ref_med")))), 13))
    assert(df.filter(col("mm").getItem(0) =!= col("ref_med") ||
      col("mm").getItem(1) =!= col("ref_mad")).count() == 0)
  }

  test("medMad is null on short or null input") {
    import sqlImplicits._
    val df = Seq((1L, Some(Seq(1L, 2L, 3L))), (2L, None))
      .toDF("id", "arr")
      .withColumn("mm", MedMadSorted.medMad(col("arr"), 13))
    assert(df.filter(col("mm").isNotNull).count() == 0)
    // mid within bounds works at the exact boundary
    val ok = Seq(Seq.tabulate(13)(_.toLong)).toDF("arr")
      .select(MedMadSorted.medMad(col("arr"), 13).as("mm"))
      .head.getSeq[Long](0)
    assert(ok == Seq(12L, 12L)) // median = max element; MAD = 12
  }
}
