package graft

import java.sql.Timestamp

import graft.queries.{RelationalQueries, StatsQueries, StreamQueries}

/** Semantics pins for the round-12 session-4 entries: one-way ANOVA
  * (a planted mean shift fires F, identical groups give F = 0),
  * Brown–Forsythe Levene (a planted VARIANCE gap fires W while equal
  * spreads with different means do not), the Wald–Wolfowitz runs test
  * (oscillating daily volume → many runs → z > 0, near-monotone → few
  * runs → z < 0, exact run counting), Cohen's kappa (perfect agreement
  * → 1, independent raters on a balanced 2×2 → 0), the two-proportion
  * pooled z-test (planted lift fires, equal rates give exactly 0), max
  * drawdown (hand-computed exact-cents series), and the streaming
  * two-proportion face (per-day lift fires on the lifted day only).
  */
class HypothesisTestsSpec extends SparkSpec {
  import sqlImplicits._

  private def writeEvents(
      rows: Seq[(Long, Long, String, Double, Timestamp)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("hyp").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val noon = Timestamp.valueOf("2024-01-05 12:00:00")

  test("agg_anova: planted mean shift fires, identical groups give F = 0") {
    def mk(shift: Double) = writeEvents(
      for (i <- 0 until 40; g <- Seq("a", "b")) yield
        (i.toLong * 2 + (if (g == "a") 0 else 1), 1L, g,
          10.0 + i % 5 + (if (g == "b") shift else 0.0), noon))
    val hot = StatsQueries.queries("agg_anova")(spark, mk(500.0))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(hot._1 == 80L && hot._2 == 2L && hot._3 == 1L && hot._4 == 78L)
    assert(hot._5 > 1000, s"shifted groups must fire: $hot")
    assert(hot._6 > 0.99, s"eta² must attribute the variance: $hot")
    val cold = StatsQueries.queries("agg_anova")(spark, mk(0.0))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // the between-term snaps to the round6 grid, so "exactly equal
    // groups" can land within one grid step of zero, not at it
    assert(math.abs(cold._5) <= 1e-4 && math.abs(cold._6) <= 1e-5,
      s"identical groups must give F ≈ 0: $cold")
  }

  test("agg_levene: variance gap fires W; equal spreads with different means do not") {
    // group a: tight ±1 around 100; group b: wide ±50 around 100
    def mk(widthB: Double) = writeEvents(
      for (i <- 0 until 40; g <- Seq("a", "b")) yield
        (i.toLong * 2 + (if (g == "a") 0 else 1), 1L, g,
          100.0 + (if (i % 2 == 0) 1 else -1) *
            (if (g == "b") widthB else 1.0), noon))
    val hot = StatsQueries.queries("agg_levene")(spark, mk(50.0))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(hot._5 > 10, s"variance gap must fire: $hot")
    // equal spread, shifted mean — Brown–Forsythe centers per-group
    // medians, so a pure location shift contributes nothing
    val shifted = writeEvents(
      for (i <- 0 until 40; g <- Seq("a", "b")) yield
        (i.toLong * 2 + (if (g == "a") 0 else 1), 1L, g,
          (if (g == "b") 500.0 else 100.0) +
            (if (i % 2 == 0) 1 else -1), noon))
    val cold = StatsQueries.queries("agg_levene")(spark, shifted)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(math.abs(cold._5) <= 1e-4,
      s"location shift alone must not fire: $cold")
  }

  test("agg_runs_test: oscillation → many runs → z > 0; near-monotone → z < 0") {
    def mkDaily(counts: Seq[Int]): String = {
      var id = 0L
      writeEvents(counts.zipWithIndex.flatMap { case (c, day) =>
        (0 until c).map { _ =>
          id += 1
          (id, 1L, "view", 1.0,
            Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"))
        }
      })
    }
    // signs + − + − + : 5 runs of 5 signs (every delta flips)
    val osc = StatsQueries.queries("agg_runs_test")(
        spark, mkDaily(Seq(10, 20, 10, 20, 10, 20)))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(osc == ((5L, 3L, 2L, 5L, osc._5)) && osc._5 > 0,
      s"oscillating series: $osc")
    // signs + + + + − : 2 runs (one momentum block, one reversal)
    val mono = StatsQueries.queries("agg_runs_test")(
        spark, mkDaily(Seq(10, 20, 30, 40, 50, 40)))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(mono == ((5L, 4L, 1L, 2L, mono._5)) && mono._5 < 0,
      s"momentum series: $mono")
  }

  test("agg_cohens_kappa: perfect agreement → 1, independent balanced raters → 0") {
    def writeDocs(rows: Seq[(Long, String, Long)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("hyp").toString
      rows.toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val longText = Seq.fill(80)("word").mkString(" ")  // 80 words
    val shortText = "tiny doc"                          // 2 words
    // both raters say keep on half, drop on half → κ = 1
    val agree = writeDocs((1 to 10).map { i =>
      if (i % 2 == 0) (i.toLong, longText, 400L)
      else (i.toLong, shortText, 100L)
    })
    val k1 = StatsQueries.queries("agg_cohens_kappa")(spark, agree)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(k1._6 == 1.0, s"perfect agreement: $k1")
    // balanced independent 2×2: long-words doc (A yes, B no — 280
    // chars but 40 words... n_chars column is the rater, so drive the
    // two raters apart explicitly): equal mass in all four cells → κ=0
    val manyShortWords = Seq.fill(70)("a").mkString(" ") // 70 words, 139 chars
    val fewLongWords = "x" * 350                         // 1 word, 350 chars
    val indep = writeDocs((1 to 8).map { i =>
      (i % 4) match {
        case 0 => (i.toLong, longText, 400L)       // A yes, B yes
        case 1 => (i.toLong, fewLongWords, 350L)   // A yes, B no
        case 2 => (i.toLong, manyShortWords, 139L) // A no,  B yes
        case _ => (i.toLong, shortText, 100L)      // A no,  B no
      }
    })
    val k0 = StatsQueries.queries("agg_cohens_kappa")(spark, indep)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(k0._4 == 0.5 && k0._6 == 0.0, s"independent raters: $k0")
  }

  test("agg_two_prop_ztest: planted lift fires; equal rates give exactly 0") {
    // even users: 50% purchase; odd users: 10% purchase
    def mk(rateA: Int, rateB: Int) = writeEvents(
      for (i <- 0 until 200; u <- Seq(0L, 1L)) yield
        (i.toLong * 2 + u, u, // user 0 = arm a, user 1 = arm b
          if ((u == 0L && i % 10 < rateA) || (u == 1L && i % 10 < rateB))
            "purchase" else "view",
          1.0, noon))
    val hot = StatsQueries.queries("agg_two_prop_ztest")(spark, mk(5, 1))
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(hot._1 == 200L && hot._3 == 100L && hot._4 == 20L)
    assert(hot._5 == 0.5 && hot._6 == 0.1 && hot._7 > 5,
      s"planted lift: $hot")
    val cold = StatsQueries.queries("agg_two_prop_ztest")(spark, mk(3, 3))
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(cold._7 == 0.0, s"equal rates: $cold")
  }

  test("win_drawdown: hand-computed exact-cents series") {
    // flows: +100.00 −50.00 +30.00 −120.00 → cum 10000,5000,8000,−4000
    // runmax stays 10000 → drawdowns 0,5000,2000,14000
    val d = writeEvents(Seq(
      (1L, 7L, "purchase", 100.0, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 7L, "error", 50.0, Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, 7L, "purchase", 30.0, Timestamp.valueOf("2024-01-01 12:00:00")),
      (4L, 7L, "error", 120.0, Timestamp.valueOf("2024-01-01 13:00:00")),
      (5L, 7L, "view", 999.0, Timestamp.valueOf("2024-01-01 14:00:00"))))
    val df = RelationalQueries.queries("win_drawdown")(spark, d)
    val r = df.as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((7L, 4L, 14000L, 10000L, -4000L)), s"drawdown: $r")
    // the one-exchange claim is tested, not asserted in prose: the two
    // running windows and the per-user collapse reuse one hash
    // partitioning on user_id (agg_funnel's shape)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("agg_mcnemar: churn fires via discordant counts; stable users contribute nothing") {
    val p1 = Timestamp.valueOf("2024-01-05 12:00:00") // first half
    val p2 = Timestamp.valueOf("2024-01-20 12:00:00") // second half
    // users 1-10 convert ONLY in P1 (lost), user 11 only in P2
    // (gained), users 12-20 convert in both (concordant, excluded)
    val d = writeEvents(
      (1L to 10L).map(u => (u, u, "purchase", 1.0, p1)) ++
      Seq((11L, 11L, "purchase", 1.0, p2)) ++
      (12L to 20L).flatMap(u => Seq(
        (u * 2, u, "purchase", 1.0, p1), (u * 2 + 1, u, "purchase", 1.0, p2))))
    val r = StatsQueries.queries("agg_mcnemar")(spark, d)
      .as[(Long, Long, Long, Double)].head()
    // chi2 = (10-1)²/11 = 81/11
    assert(r._1 == 20L && r._2 == 10L && r._3 == 1L, s"counts: $r")
    assert(math.abs(r._4 - 81.0 / 11.0) < 1e-6, s"chi2: $r")
  }

  test("agg_friedman: consistent within-day ranking fires; flat cells give Q = 0") {
    // 6 days, 3 types; type value ladder identical every day → perfect
    // consistency: Rj = {6, 12, 18}, Q = 12/(6·3·4)·504 − 3·6·4 = 12
    def mk(ladder: Boolean) = writeEvents(
      for (day <- 1 to 6; (t, rank) <- Seq(("a", 1), ("b", 2), ("c", 3)))
        yield ((day * 10 + rank).toLong, 1L, t,
          if (ladder) rank * 10.0 else 10.0,
          Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")))
    val hot = StatsQueries.queries("agg_friedman")(spark, mk(true))
      .as[(Long, Long, Double)].head()
    assert(hot == ((6L, 3L, 12.0)), s"consistent ladder: $hot")
    // identical cell means → all midranks = 2 → Rj = 12 each →
    // Q = 12/72·432 − 72 = 0
    val cold = StatsQueries.queries("agg_friedman")(spark, mk(false))
      .as[(Long, Long, Double)].head()
    assert(cold._3 == 0.0, s"flat cells: $cold")
  }

  test("agg_xcorr: planted 2-day lead recovered at lag -2 and only there") {
    // views on day i follow v(i) = 5 + i² mod 7; purchases on day i
    // replay v(i−2) — views LEAD purchases by exactly 2 days, so the
    // pairing (x_t, y_{t+lag}) is the identical series at lag = −2
    def v(i: Int) = 5 + (i * i) % 7
    var id = 0L
    val d = writeEvents((1 to 12).flatMap { i =>
      val day = Timestamp.valueOf(f"2024-01-$i%02d 12:00:00")
      val views = (0 until v(i)).map { _ =>
        id += 1; (id, 1L, "view", 1.0, day)
      }
      val purchases = (0 until (if (i >= 3) v(i - 2) else 3)).map { _ =>
        id += 1; (id, 1L, "purchase", 1.0, day)
      }
      views ++ purchases
    })
    val rows = StatsQueries.queries("agg_xcorr")(spark, d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows.size == 7 && rows(-2L)._3 == 1.0, rows.toString)
    assert(rows.filterKeys(_ != -2L).values.forall(_._3 < 1.0),
      rows.toString)
    // streaming face: same corpus driven through per-day counter state
    // must land on the identical 7-row CCF
    val srows = StreamQueries.queries("stream_xcorr")(spark, d)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(srows == rows, s"stream/batch parity: $srows vs $rows")
  }

  test("agg_abc_analysis: boundary parts classify by inclusive integer cross-multiply") {
    // revenues 80, 15, 3, 2 dollars: part 1 alone is exactly 80% → A;
    // part 2 lands exactly on 95% → B; parts 3-4 → C
    val dir = java.nio.file.Files.createTempDirectory("hyp").toString
    Seq((1L, 80.0), (2L, 15.0), (3L, 3.0), (4L, 2.0))
      .toDF("l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = StatsQueries.queries("agg_abc_analysis")(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 1L, 0.8)), got.toString)
    assert(got("B") == (("B", 1L, 0.15)), got.toString)
    assert(got("C") == (("C", 2L, 0.05)), got.toString)
  }

  test("agg_lorenz_curve: linear spend ladder gives the closed-form shares") {
    // customers 1..10 spend i dollars → share at decile d = d(d+1)/110
    val dir = java.nio.file.Files.createTempDirectory("hyp").toString
    (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.queries("agg_lorenz_curve")(spark, dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 10 && got(10L)._3 == 1.0, got.toString)
    assert(got(1L) == ((1L, 1L, 0.018182)), got(1L).toString)
    assert(got(5L) == ((5L, 5L, 0.272727)), got(5L).toString)
  }

  test("agg_rfm: a clean frequency ladder lands 2 users per quintile") {
    // user u makes u purchases on the same day → freq/mon ladders are
    // aligned, recency is constant (everyone scores r=5)
    var id = 0L
    val d = writeEvents((1 to 10).flatMap { u =>
      (0 until u).map { _ =>
        id += 1; (id, u.toLong, "purchase", 1.0, noon)
      }
    })
    val got = StatsQueries.queries("agg_rfm")(spark, d)
      .as[(Int, Int, Int, Long)].collect().sortBy(_._2)
    assert(got.length == 5, got.toSeq.toString)
    assert(got.forall(r => r._1 == 5 && r._2 == r._3 && r._4 == 2L),
      got.toSeq.toString)
    assert(got.map(_._2).toSeq == Seq(1, 2, 3, 4, 5), got.toSeq.toString)
    // streaming face: per-user (last_day,freq,mon) state then the same
    // threshold projection must land on the identical grid
    val sgot = StreamQueries.queries("stream_rfm")(spark, d)
      .as[(Int, Int, Int, Long)].collect().sortBy(_._2)
    assert(sgot.toSeq == got.toSeq,
      s"stream/batch parity: ${sgot.toSeq} vs ${got.toSeq}")
  }

  test("agg_forecast_mase: weekly-periodic series scores 0, linear trend scores 7") {
    def mkDaily(counts: Seq[Int]): String = {
      var id = 0L
      writeEvents(counts.zipWithIndex.flatMap { case (c, day) =>
        (0 until c).map { _ =>
          id += 1
          (id, 1L, "view", 1.0,
            Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"))
        }
      })
    }
    // exact weekly period → the day-7 lag predicts perfectly → mase 0
    val periodic = StatsQueries.queries("agg_forecast_mase")(
        spark, mkDaily(Seq.fill(3)(Seq(5, 6, 7, 8, 9, 10, 11)).flatten))
      .as[(String, Long, Double, Double, Double)].head()
    assert(periodic._2 == 14L && periodic._4 == 0.0 && periodic._5 == 0.0,
      periodic.toString)
    // linear trend c_t = 10 + t → |e1| = 1, |e7| = 7 → mase = 7 exactly
    val linear = StatsQueries.queries("agg_forecast_mase")(
        spark, mkDaily((1 to 21).map(10 + _)))
      .as[(String, Long, Double, Double, Double)].head()
    assert(linear._3 == 1.0 && linear._4 == 7.0 && linear._5 == 7.0,
      linear.toString)
  }

  test("agg_ols_grouped: recovers a planted line exactly; r2 = 1 on noiseless data") {
    // y = 3x + 7 dollars exactly, per flag — slope 3, intercept 7, r²=1
    val dir = java.nio.file.Files.createTempDirectory("hyp").toString
    (for (f <- Seq("A", "B"); x <- 1 to 20) yield
      (f, x.toDouble, 3.0 * x + 7.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = StatsQueries.queries("agg_ols_grouped")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == 2 &&
      got.forall(r => r._2 == 20L && r._3 == 3.0 && r._4 == 7.0 &&
        r._5 == 1.0), got.toSeq.toString)
  }

  test("agg_markov_transitions: deterministic chain recovers exact probabilities") {
    // user 1 repeats a→b→a→c: from a, half the transitions go to b
    // and half to c; b and c always return to a
    val seq1 = Seq("a", "b", "a", "c", "a", "b", "a", "c", "a")
    val d = writeEvents(seq1.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, 1L, t, 1.0,
        Timestamp.valueOf(f"2024-01-01 ${10 + i}%02d:00:00"))
    })
    val got = StatsQueries.queries("agg_markov_transitions")(spark, d)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", "b")) == (("a", "b", 2L, 0.5)), got.toString)
    assert(got(("a", "c")) == (("a", "c", 2L, 0.5)), got.toString)
    assert(got(("b", "a")) == (("b", "a", 2L, 1.0)), got.toString)
    assert(got(("c", "a")) == (("c", "a", 2L, 1.0)), got.toString)
    assert(got.size == 4, got.toString)
    // streaming face: the one-row-per-user state must chain the same
    // pairs and land on the identical matrix
    val sgot = StreamQueries.queries("stream_markov")(spark, d)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(sgot == got, s"stream/batch parity: $sgot vs $got")
  }

  test("agg_survival_km: hand-computed curve with a censored long-liver") {
    def day(i: Int) = Timestamp.valueOf(f"2024-01-$i%02d 12:00:00")
    // users die at lifetimes 1, 2, 4; user 4 spans the whole corpus →
    // censored, so it thins the risk set without a death step
    val d = writeEvents(Seq(
      (1L, 1L, "view", 1.0, day(1)), (2L, 1L, "view", 1.0, day(2)),
      (3L, 2L, "view", 1.0, day(1)), (4L, 2L, "view", 1.0, day(3)),
      (5L, 3L, "view", 1.0, day(1)), (6L, 3L, "view", 1.0, day(5)),
      (7L, 4L, "view", 1.0, day(1)), (8L, 4L, "view", 1.0, day(30))))
    val got = StatsQueries.queries("agg_survival_km")(spark, d)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // S(1)=3/4, S(2)=3/4·2/3=1/2, S(4)=1/2·1/2=1/4
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5),
      (4L, 2L, 1L, 0.25)), got.toSeq.toString)
    // streaming face: per-user (first,last) state then the same batch
    // projection must land on the identical curve
    val sgot = StreamQueries.queries("stream_survival")(spark, d)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(sgot.toSeq == got.toSeq,
      s"stream/batch parity: ${sgot.toSeq} vs ${got.toSeq}")
  }

  test("stream_two_prop: per-day lift fires on the lifted day only") {
    val day1 = Timestamp.valueOf("2024-01-01 12:00:00")
    val day2 = Timestamp.valueOf("2024-01-02 12:00:00")
    val d = writeEvents(
      // day 1: arm a converts 50%, arm b 10% — z > 0
      (for (i <- 0 until 100; u <- Seq(0L, 1L)) yield
        (i.toLong * 2 + u, u,
          if ((u == 0L && i % 10 < 5) || (u == 1L && i % 10 < 1))
            "purchase" else "view", 1.0, day1)) ++
      // day 2: both arms 30% — z = 0 exactly
      (for (i <- 0 until 100; u <- Seq(0L, 1L)) yield
        (400L + i.toLong * 2 + u, u,
          if (i % 10 < 3) "purchase" else "view", 1.0, day2)))
    val rows = StreamQueries.queries("stream_two_prop")(spark, d)
      .as[(Timestamp, Long, Long, Long, Long, Double)].collect()
      .sortBy(_._1.getTime)
    assert(rows.length == 2, s"two day rows: ${rows.toSeq}")
    assert(rows(0)._4 == 50L && rows(0)._5 == 10L && rows(0)._6 > 5,
      s"lifted day: ${rows(0)}")
    assert(rows(1)._6 == 0.0, s"flat day: ${rows(1)}")
  }
}
