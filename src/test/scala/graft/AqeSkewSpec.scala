package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling evidence: AQE's skew-join split is the
  * engine-level complement of the manual salting in `join_skew_salted` —
  * salting is the plan-time fix you choose when you KNOW the hot key;
  * AQE splits oversized partitions at runtime when you don't. This spec
  * pins that the split actually fires on a hot-key join under the
  * documented thresholds, so the claim in PLANS.md §6 is executable, not
  * aspirational. */
class AqeSkewSpec extends SparkSpec {
  import sqlImplicits._

  test("AQE splits the skewed join partition at runtime (skew=true)") {
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> util.Try(spark.conf.get(k)).toOption).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the ~1 MB hot partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force a sort-merge join (broadcast would hide the skew path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 99% of fact rows share key 0; dim has 100 distinct keys
      val fact = spark.range(0, 200000)
        .select((when(col("id") % 100 === 0, col("id") % 100)
          .otherwise(0L)).as("k"),
          concat(lit("payload-"), col("id")).as("pay"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      val joined = fact.join(dim, "k")
      // materialize THIS DataFrame's own execution (count() would spawn
      // a separate one and leave this plan un-finalized), then read the
      // final adaptive plan back from it
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew split in plan:\n${plan.take(2000)}")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
