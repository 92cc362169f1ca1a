package graft

/** The layout-regression gate (VERDICT r14 ask #8): every layout-serving
  * entry in [[PlanAudit.expectedShapes]] is planned at sf0.001 and its
  * executed plan's scans must carry the expected PushedFilters /
  * PartitionFilters — one auditable gate instead of assertions scattered
  * across feature specs. A failure here means a planner upgrade, a
  * layout-write change, or an entry edit silently stopped pruning:
  * results would still be correct, the 100 TB cost story would not. */
class PlanShapeSpec extends SparkSpec {

  private val dir = Seq(sfDir("0.001"), sfDir("0.01"))
    .find(d => new java.io.File(d).isDirectory)

  test("every layout-serving entry's executed plan carries its expected " +
      "scan shape (PlanAudit.expectedShapes) and node shape " +
      "(PlanAudit.expectedNodes)") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val names = (PlanAudit.expectedShapes.keySet
      ++ PlanAudit.expectedNodes.keySet).toSeq.sorted
    val violations = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, dir.get)
      // force execution so layouts land and AQE finalizes the plan
      assert(df.collect().nonEmpty, s"$name returned no rows")
      PlanAudit.shapeViolations(name, df.queryExecution.executedPlan)
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("node rules report violations (the gate can fail)") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    // negative control: a bare scan has no SortMergeJoin to satisfy
    // join_bucketed's presence rule
    val df = Tables.orders(spark, dir.get)
    df.collect()
    val v = PlanAudit.shapeViolations("join_bucketed",
      df.queryExecution.executedPlan)
    assert(v.nonEmpty && v.exists(_.contains("SortMergeJoinExec")))
  }

  test("shapeViolations reports a missing needle (the gate can fail)") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    // negative control: a plain unpartitioned scan cannot satisfy
    // vec_ann_ivf_pruned's cell-pruning expectation
    val df = Tables.embeddings(spark, dir.get)
    df.collect()
    val v = PlanAudit.shapeViolations("vec_ann_ivf_pruned",
      df.queryExecution.executedPlan)
    assert(v.nonEmpty && v.head.contains("PartitionFilters"))
  }
}
