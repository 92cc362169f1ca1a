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
