package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev audit main: walks every registry entry's physical plan and
  * reports WindowExec nodes with an EMPTY partition spec — the
  * single-task global-sort shape that cannot survive a corpus-sized
  * input (every such window funnels the whole relation through one
  * task). The suite claim "no unpartitioned windows in product code"
  * is enforced by grep on `Window.orderBy` call sites; this audit
  * closes the gap grep cannot see: windows introduced via SQL strings,
  * builder helpers, or plans Catalyst rewrites into a WindowExec.
  *
  * Usage: `graft.PlanAudit [sfDir] [entry,entry,...]`. With an entry
  * filter it also prints per-entry plan-shape stats (scan / reused /
  * window node counts) to stderr — the quick "did this stay one
  * corpus scan" probe. Prints one line per offending (entry, window)
  * pair to stdout; exit code 0 always — it is a reporting tool, the
  * judgment of "bounded by construction" vs "scale bug" stays with
  * the reader (some unpartitioned windows run over provably tiny
  * relations, e.g. max-count ties or ≤1024 bucket totals — those are
  * documented, not bugs).
  */
object PlanAudit {

  /** Expected scan shapes for every LAYOUT-SERVING registry entry —
    * the invariants that make each layout worth its disk: a z-order
    * layout that stops receiving its pushed range predicates, or a
    * cell/label-partitioned ANN layout whose probes stop pruning
    * partitions, still returns correct rows while silently reading the
    * whole corpus. Each requirement is (scan-metadata key, needle):
    * SOME FileScan in the entry's executed plan must carry the needle
    * (case-insensitive) in that metadata value. Scan METADATA is
    * checked, not the rendered plan string — plan rendering truncates
    * long filter lists, metadata does not. Asserted per entry in
    * PlanShapeSpec; also reported by this audit main. */
  val expectedShapes: Map[String, Seq[(String, String)]] = Map(
    // both rectangle dimensions pushed to the z-run layout's footers
    "scan_zorder_prune" -> Seq(
      ("PushedFilters", "GreaterThanOrEqual(o_custkey"),
      ("PushedFilters", "LessThanOrEqual(o_custkey"),
      ("PushedFilters", "GreaterThanOrEqual(o_totalprice"),
      ("PushedFilters", "LessThanOrEqual(o_totalprice")),
    // the day filter resolves against hive partition directories
    "scan_partition_prune" -> Seq(("PartitionFilters", "event_date")),
    // DYNAMIC pruning: the dim filter reaches the fact scan as a
    // runtime subquery, not a literal
    "join_partition_prune" -> Seq(("PartitionFilters", "dynamicpruning")),
    // ANN layouts: probes (and the label predicate, where the layout
    // has one) prune partitions
    "vec_ann_lsh_pruned" -> Seq(("PartitionFilters", "bucket")),
    "vec_ann_ivf_pruned" -> Seq(("PartitionFilters", "cell")),
    "vec_ann_filtered" -> Seq(
      ("PartitionFilters", "label"), ("PartitionFilters", "cell")),
    "stream_vec_ingest" -> Seq(("PartitionFilters", "cell")),
    "stream_vec_ingest_filtered" -> Seq(
      ("PartitionFilters", "label"), ("PartitionFilters", "cell")),
    // the PQ tiers' FINAL plan is the exact rerank: its layout scan
    // must push the candidate-id IN list (row-group skipping over the
    // id-sorted layout). The ADC stage's cell PartitionFilters are an
    // earlier eager execution, pinned on that stage's own frame in
    // VectorOpsSpec — not visible in the returned plan.
    "vec_ann_ivfpq" -> Seq(("PushedFilters", "In(vec_id")),
    "stream_pq_ingest" -> Seq(("PushedFilters", "In(vec_id")))

  /** Every FileSourceScanExec under `p`, walking adaptive/staged
    * subtrees and subqueries. */
  def collectScans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    val self = p match {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children ++ other.subqueries
    }
    self ++ kids.flatMap(collectScans)
  }

  /** Violations of [[expectedShapes]] for `name`'s executed plan —
    * empty when the entry has no expectation or every needle is
    * carried by some scan. */
  def shapeViolations(name: String, plan: SparkPlan): Seq[String] = {
    val reqs = expectedShapes.getOrElse(name, Nil)
    if (reqs.isEmpty) return Nil
    val scans = collectScans(plan)
    reqs.flatMap { case (key, needle) =>
      val ok = scans.exists(_.metadata.get(key)
        .exists(_.toLowerCase.contains(needle.toLowerCase)))
      if (ok) None
      else Some(s"$name: no FileScan whose $key contains '$needle' " +
        s"(${scans.size} scans inspected)")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "86400s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // WARN so WindowExec's own single-partition warning interleaves
    // with the per-entry markers below: eager executions inside an
    // entry's builder (checkpoint loops, fixture writes) never appear
    // in the FINAL plan, but their warnings land between markers.
    spark.sparkContext.setLogLevel("WARN")

    // walk INTO adaptive plans and reused/staged subtrees, then collect
    def windows(p: SparkPlan): Seq[(String, SparkPlan)] = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          Seq(("WindowExec", w))
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          Seq(("WindowGroupLimitExec", w))
        case _ => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children ++ other.subqueries
      }
      self ++ kids.flatMap(windows)
    }

    val only: Option[Set[String]] =
      args.drop(1).headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        System.err.println(s"[audit-entry] $name")
        val df = fn(spark, sfDir)
        val hits = windows(df.queryExecution.executedPlan)
        hits.foreach { case (kind, w) =>
          println(s"$name\t$kind\t${w.simpleStringWithNodeId().take(160)}")
        }
        shapeViolations(name, df.queryExecution.executedPlan)
          .foreach(v => println(s"$name\tShapeViolation\t$v"))
        if (only.isDefined) {
          // force execution so AQE finalizes, then report plan shape
          df.write.format("noop").mode("overwrite").save()
          val plan = df.queryExecution.executedPlan.toString
          def n(re: String) = re.r.findAllIn(plan).size
          System.err.println(s"[audit-plan] $name scans=${n("FileScan ")} " +
            s"reused=${n("Reused")} windows=${n("WindowExec")}")
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[audit] $name failed to plan: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
