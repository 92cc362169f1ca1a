package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch-tier aggregates (`agg_approx_distinct`,
  * `agg_approx_quantile`) against their exact twins on real corpus data.
  */
class SketchSpec extends SparkSpec {

  private val d = sfDir("0.01")

  test("approx_count_distinct is within 5% of exact") {
    val row = Tables.lineitem(spark, d).agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      count_distinct(col("l_partkey")).as("e")).collect().head
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
  }

  test("approx_percentile(accuracy=10000) is within 1% of exact") {
    val row = Tables.lineitem(spark, d).agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"),
      expr("percentile(l_extendedprice, array(0.5, 0.95))"))
      .collect().head
    val approx = row.getSeq[Double](0)
    val exact = row.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }
}
