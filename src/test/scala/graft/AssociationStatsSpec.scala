package graft

import java.sql.Timestamp

import graft.queries.StatsQueries

/** Semantics pins for the round-12 statistics entries: chi-square
  * independence (dependence fires, independence doesn't), Jensen-Shannon
  * drift (planted shift dominates; SYMMETRY — the property that
  * distinguishes JSD from KL), Theil–Sen (outlier immunity — the reason
  * to prefer it over OLS), and Shannon diversity (uniform mix maxes the
  * normalized entropy, collapsed mix zeroes it).
  */
class AssociationStatsSpec extends SparkSpec {
  import sqlImplicits._

  private def writeEvents(
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("assoc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("agg_chi2: day-of-week-dependent mix fires, independent mix does not") {
    // dependent: type "week" only on weekdays, type "end" only on the
    // weekend of the same span. independent: both types uniform.
    def mk(dependent: Boolean) = writeEvents(
      (for {
        day <- 1 to 14 // 2024-01-01 (Mon) .. 01-14 (Sun)
        i <- 0 until 10
        tpe <- Seq("week", "end")
      } yield {
        val dow = day % 7 // 2024-01-01 = Monday ⇒ day 7 is Sunday (0)
        val keep = if (!dependent) true
          else if (tpe == "week") dow >= 1 && dow <= 5 else dow == 0 || dow == 6
        if (!keep) None
        else Some(((day * 100 + i).toLong,
          Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 1L, tpe,
          1.0, "{}"))
      }).flatten)
    val dep = StatsQueries.queries("agg_chi2")(spark, mk(true))
      .as[(Long, Long, Double, Double)].head()
    val ind = StatsQueries.queries("agg_chi2")(spark, mk(false))
      .as[(Long, Long, Double, Double)].head()
    assert(dep._2 == 6L && ind._2 == 6L) // dof = (2-1)*(7-1)
    // perfect separation: chi2 ≈ n, cramers_v ≈ 1; independence: 0
    assert(dep._3 > dep._1 * 0.9, s"dependent chi2 ${dep._3} vs n ${dep._1}")
    assert(dep._4 > 0.9, s"dependent cramers_v ${dep._4}")
    assert(ind._3 == 0.0 && ind._4 == 0.0,
      s"independent chi2 ${ind._3} v ${ind._4}")
  }

  test("agg_jsd_drift: planted shift dominates a stable type and JSD is symmetric") {
    def mk(swap: Boolean) = writeEvents(
      for {
        half <- Seq(true, false)
        i <- 0 until 50
        tpe <- Seq("stable", "drifted")
      } yield {
        val fh = if (swap) !half else half
        val ts = if (fh) Timestamp.valueOf("2024-01-10 00:00:00")
          else Timestamp.valueOf("2024-01-20 00:00:00")
        val v = if (tpe == "drifted" && !half) 210.0 else 10.0
        ((i + (if (fh) 0 else 1000)).toLong, ts, 1L, tpe, v, "{}")
      })
    def jsd(dir: String) =
      StatsQueries.queries("agg_jsd_drift")(spark, dir)
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r._4).toMap
    val a = jsd(mk(false))
    val b = jsd(mk(true))
    assert(a("drifted") > 0.3, s"drifted JSD ${a("drifted")}")
    assert(a("stable").abs < 0.01, s"stable JSD ${a("stable")}")
    // symmetry: swapping which half is which must not move JSD
    assert(a("drifted") == b("drifted"),
      s"asymmetric: ${a("drifted")} vs ${b("drifted")}")
  }

  test("agg_theil_sen: one spiked day cannot move the median slope") {
    // counts 5 + 2t on days t=0..10, except day 5 spikes to 100 events:
    // 45 of 55 pairwise slopes are exactly 2.0 — the median ignores the
    // outlier entirely (OLS on the same series fits ~2.6).
    val rows = for {
      t <- 0 to 10
      i <- 0 until (if (t == 5) 100 else 5 + 2 * t)
    } yield ((t * 1000 + i).toLong,
      Timestamp.valueOf(f"2024-01-${t + 1}%02d 08:00:00"), 1L, "a",
      1.0, "{}")
    val got = StatsQueries.queries("agg_theil_sen")(spark,
      writeEvents(rows)).as[(String, Long, Double)].head()
    assert(got._2 == 55L, s"n_pairs ${got._2}")
    assert(got._3 == 2.0, s"ts_slope ${got._3}")
  }

  test("single-scan discipline: margin/grid consumers read the checkpointed tiny relation, not the corpus") {
    val dir = writeEvents((0 until 20).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-${i % 5 + 1}%02d 08:00:00"), 1L,
      if (i % 2 == 0) "a" else "b", 1.0, "{}")))
    for (q <- Seq("agg_chi2", "agg_shannon_diversity", "agg_theil_sen")) {
      val plan = StatsQueries.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      // the corpus scan ran once, INSIDE the localCheckpoint job; every
      // margin/grid/assembly consumer reads the materialized relation
      assert(!plan.contains("FileScan"),
        s"$q re-scans the corpus after checkpoint:\n$plan")
    }
  }

  test("agg_shannon_diversity: uniform mix → norm 1, collapsed mix → 0") {
    val rows = (for {
      tpe <- Seq("a", "b", "c", "d"); i <- 0 until 25
    } yield ((tpe(0) * 100 + i).toLong,
      Timestamp.valueOf("2024-01-10 08:00:00"), 1L, tpe, 1.0, "{}")) ++
      (0 until 100).map(i => ((2000 + i).toLong,
        Timestamp.valueOf("2024-01-11 08:00:00"), 1L, "a", 1.0, "{}"))
    val got = StatsQueries.queries("agg_shannon_diversity")(spark,
      writeEvents(rows))
      .as[(Timestamp, Long, Long, Double, Double)].collect()
      .map(r => r._1.toString.take(10) -> r).toMap
    val uni = got("2024-01-10")
    val one = got("2024-01-11")
    // per-term round6 snapping leaves ~1e-6 residue on the ratio
    assert(uni._3 == 4L && math.abs(uni._5 - 1.0) < 1e-5, s"uniform $uni")
    assert(one._3 == 1L && one._4 == 0.0 && one._5 == 0.0,
      s"collapsed $one")
  }
}
