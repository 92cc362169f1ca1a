package graft

/** Dynamic partition pruning on the join_partition_prune entry: the
  * partitions to read are decided by the DIM side at runtime, so the
  * proof is the injected `dynamicpruning` subquery in the fact scan's
  * PartitionFilters — a literal filter would be STATIC pruning (the
  * scan_partition_prune entry) and prove nothing about the join path.
  */
class DppSpec extends SparkSpec {

  test("join_partition_prune fact scan carries a dynamicpruning filter") {
    val df = SparkEntry.queries("join_partition_prune")(
      spark, sfDir("0.001"))
    // plan BEFORE execution already carries the pruning subquery; run it
    // too so the assertion covers the adaptive (final) plan string
    val rows = df.collect()
    assert(rows.length == 5, s"busiest-5 cut returned ${rows.length} days")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning in fact scan plan:\n$plan")
  }
}
