package graft

import java.sql.Timestamp

import graft.queries.StatsQueries

/** Semantics pins for the round-12 session-3 statistics entries:
  * Kendall tau-b (perfect monotone → ±1, ties handled by the b
  * correction), Kruskal–Wallis (a shifted group fires, identical groups
  * don't), mutual information (deterministic dependence → NMI ≈ 1,
  * independence → 0), Cohen's d (recovers a planted standardized shift),
  * and the deterministic bootstrap CI (brackets the mean; replica
  * membership is hash-seeded, so two runs are bit-identical).
  */
class RankStatsSpec extends SparkSpec {
  import sqlImplicits._

  private def writeLineitem(rows: Seq[(Double, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    rows.toDF("l_quantity", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def writeEvents(rows: Seq[(String, Double, Timestamp)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    rows.toDF("event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("agg_kendall_tau: monotone → 1, anti-monotone → -1, ties stay in [-1,1]") {
    // qty i maps to discount i/100 (perfect concordance), then reversed
    val up = writeLineitem((1 to 10).map(i => (i.toDouble, i / 100.0)))
    val down = writeLineitem((1 to 10).map(i => (i.toDouble, (11 - i) / 100.0)))
    val tUp = StatsQueries.queries("agg_kendall_tau")(spark, up)
      .as[(Long, Double)].head()
    val tDown = StatsQueries.queries("agg_kendall_tau")(spark, down)
      .as[(Long, Double)].head()
    assert(tUp == ((10L, 1.0)), s"concordant: $tUp")
    assert(tDown == ((10L, -1.0)), s"discordant: $tDown")
    // heavy ties: two qty levels × two discount levels, balanced — the
    // 2×2 grid with equal mass has as many concordant as discordant
    val tied = writeLineitem(for {
      a <- Seq(1.0, 2.0); b <- Seq(0.01, 0.02); _ <- 1 to 5
    } yield (a, b))
    val tTied = StatsQueries.queries("agg_kendall_tau")(spark, tied)
      .as[(Long, Double)].head()
    assert(tTied._2 == 0.0, s"balanced grid: $tTied")
  }

  test("agg_kruskal_wallis: a shifted group fires, identical groups do not") {
    val ts = Timestamp.valueOf("2024-01-05 12:00:00")
    def mk(shift: Double) = writeEvents(
      for (i <- 0 until 40; g <- Seq("a", "b")) yield
        (g, i.toDouble + (if (g == "b") shift else 0.0), ts))
    val hot = StatsQueries.queries("agg_kruskal_wallis")(spark, mk(1000.0))
      .as[(Long, Long, Double, Double)].head()
    val cold = StatsQueries.queries("agg_kruskal_wallis")(spark, mk(0.0))
      .as[(Long, Long, Double, Double)].head()
    assert(hot._1 == 80L && hot._2 == 1L)
    // complete separation of two n=40 groups: H ≈ 3·(n_g·n)²·2/(n_g·n·(n+1)) ≈ 60
    assert(hot._4 > 50, s"separated H: $hot")
    // identical groups share every rank midpoint: H exactly 0 after ties
    assert(cold._4 == 0.0, s"identical H: $cold")
  }

  test("agg_mutual_info: deterministic dependence → NMI ≈ 1, independence → 0") {
    // dependent: each type occurs on exactly one distinct weekday
    // (2024-01-01 Mon .. 01-07 Sun), uniformly
    val dep = writeEvents(for (d <- 1 to 7; _ <- 1 to 10) yield
      (s"t$d", 1.0, Timestamp.valueOf(f"2024-01-0$d%d 12:00:00")))
    // independent: every type uniform over all 7 weekdays
    val ind = writeEvents(for (d <- 1 to 7; t <- 1 to 7; _ <- 1 to 3) yield
      (s"t$t", 1.0, Timestamp.valueOf(f"2024-01-0$d%d 12:00:00")))
    val rDep = StatsQueries.queries("agg_mutual_info")(spark, dep)
      .as[(Long, Double, Double, Double, Double)].head()
    val rInd = StatsQueries.queries("agg_mutual_info")(spark, ind)
      .as[(Long, Double, Double, Double, Double)].head()
    // perfect dependence: MI = H_row = H_col = ln 7, NMI = 1 (up to the
    // 1e-6 fixed-point grid)
    assert(math.abs(rDep._2 - math.log(7)) < 1e-4, s"dep MI: $rDep")
    assert(math.abs(rDep._5 - 1.0) < 1e-4, s"dep NMI: $rDep")
    assert(rInd._2 == 0.0 && rInd._5 == 0.0, s"ind: $rInd")
  }

  test("agg_cohens_d: recovers a planted standardized shift; zero when equal") {
    val ts = Timestamp.valueOf("2024-01-05 12:00:00")
    // two arms, same spread (sd=2 over {-3,-1,1,3}·... use symmetric 4-point
    // set), arm a shifted by +2 → d = 2 / sd
    val base = Seq(10.0, 12.0, 14.0, 16.0) // sd^2 = 20/3 (sample), sd ≈ 2.582
    def mk(shift: Double) = writeEvents(
      (for (v <- base; _ <- 1 to 5) yield ("purchase", v + shift, ts)) ++
        (for (v <- base; _ <- 1 to 5) yield ("view", v, ts)))
    val hot = StatsQueries.queries("agg_cohens_d")(spark, mk(2.0))
      .as[(Long, Long, Double, Double)].head()
    val cold = StatsQueries.queries("agg_cohens_d")(spark, mk(0.0))
      .as[(Long, Long, Double, Double)].head()
    assert(hot._1 == 20L && hot._2 == 20L)
    // pooled sd over 20-per-arm replicated base: ss = 20·5·(20/4)... use
    // the definition directly: mean diff 2, pooled sd = sqrt(ss/df)
    val vals = base.flatMap(v => Seq.fill(5)(v))
    val m = vals.sum / vals.size
    val ss = vals.map(v => (v - m) * (v - m)).sum
    val sp = math.sqrt(2 * ss / (2 * vals.size - 2))
    assert(math.abs(hot._3 - 2.0 / sp) < 1e-5, s"d: ${hot._3} vs ${2.0 / sp}")
    assert(cold._3 == 0.0 && cold._4 == 0.0, s"equal arms: $cold")
    // Hedges' g shrinks toward zero, same sign
    assert(hot._4 > 0 && hot._4 < hot._3, s"g: $hot")
  }

  test("agg_seasonal_decompose: recovers a planted weekday pattern over a linear trend") {
    // 28 days (4 full weeks) starting Mon 2024-01-01: base load grows
    // linearly (+2/day) and Sundays carry a +50 planted seasonal bump
    val rows = for {
      day <- 1 to 28
      dow = (day - 1) % 7 // 0 = Monday ... 6 = Sunday
      n = 10 + 2 * day + (if (dow == 6) 50 else 0)
      i <- 1 to n
    } yield ("load", 1.0, Timestamp.valueOf(f"2024-01-$day%02d 08:00:00"))
    val out = StatsQueries.queries("agg_seasonal_decompose")(spark, writeEvents(rows))
      .as[(String, Timestamp, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._2.getTime)
    assert(out.length == 28)
    // edge days (first/last 3) have no full centered window → null trend
    assert(out.take(3).forall(_._4.isEmpty) && out.takeRight(3).forall(_._4.isEmpty))
    assert(out.drop(3).dropRight(3).forall(_._4.nonEmpty))
    // the Sunday seasonal component dominates every other weekday's
    val sundaySeas = out.filter(r => r._5.nonEmpty &&
      new java.text.SimpleDateFormat("EEE").format(r._2) == "Sun").head._5.get
    val otherSeas = out.filter(r => r._5.nonEmpty &&
      new java.text.SimpleDateFormat("EEE").format(r._2) != "Sun").map(_._5.get)
    assert(sundaySeas > 35, s"sunday seasonal $sundaySeas")
    assert(otherSeas.forall(_ < 5), s"weekday seasonals ${otherSeas.distinct.toSeq}")
    // where defined, the decomposition reassembles the observation
    out.filter(r => r._4.nonEmpty && r._6.nonEmpty).foreach { r =>
      assert(math.abs(r._3 - (r._4.get + r._5.get + r._6.get)) < 1e-4,
        s"n=trend+seasonal+resid violated at ${r._2}: $r")
    }
    // residuals are small relative to the planted bump: the structure
    // landed in trend+seasonal, not the remainder
    val resids = out.flatMap(_._6)
    assert(resids.forall(r => math.abs(r) < 15), s"max |resid| ${resids.map(math.abs).max}")
  }

  test("agg_power_analysis: matches the closed form and scales with variance") {
    val ts = Timestamp.valueOf("2024-01-05 12:00:00")
    def mk(spread: Double) = writeEvents(
      (1 to 500).map(i => ("e", 100.0 + (if (i % 2 == 0) spread else -spread), ts)))
    val narrow = StatsQueries.queries("agg_power_analysis")(spark, mk(1.0))
      .as[(Long, Double, Double, Double, Long)].head()
    val wide = StatsQueries.queries("agg_power_analysis")(spark, mk(10.0))
      .as[(Long, Double, Double, Double, Long)].head()
    assert(narrow._1 == 500L && narrow._2 == 100.0)
    // ±spread around 100 → sample var = spread²·n/(n−1); n = ceil(2(z..)²σ²/δ²)
    def expected(spread: Double) = {
      val v = spread * spread * 500 / 499.0
      math.ceil(v / 1.0 * 2.0 * 2.801585 * 2.801585).toLong // mde = 1% of 100 = 1
    }
    assert(narrow._5 == expected(1.0), s"narrow: $narrow vs ${expected(1.0)}")
    assert(wide._5 == expected(10.0), s"wide: $wide vs ${expected(10.0)}")
    assert(wide._5 > narrow._5 * 50)
  }

  test("win_rolling_zscore: flags a spike against the user's own baseline") {
    // one user: 24 stable values (alternating 10/12), then a 100 spike
    val rows = (1 to 24).map(i =>
      (i.toLong, 1L, if (i % 2 == 0) 10.0 else 12.0,
        Timestamp.valueOf(f"2024-01-01 ${i - 1}%02d:00:00"))) :+
      (25L, 1L, 100.0, Timestamp.valueOf("2024-01-02 01:00:00"))
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    rows.toDF("event_id", "user_id", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.RelationalQueries.queries("win_rolling_zscore")(spark, dir)
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    // first 12 rows: under-12 baseline → null
    assert(out.take(12).forall(_._3.isEmpty))
    // stable tail rows: |z| ≈ 1 (alternating series)
    val stable = out.slice(12, 24).flatMap(_._3)
    assert(stable.nonEmpty && stable.forall(z => math.abs(z) < 2), stable.toSeq.toString)
    // the spike: z far outside any reasonable gate
    val spike = out.last._3.get
    assert(spike > 10, s"spike z $spike")
  }

  test("agg_winsorize: clipping tames a planted outlier the plain mean eats") {
    val ts = Timestamp.valueOf("2024-01-05 12:00:00")
    // 99 values at 10.0 + one fat-finger 100000.0
    def mk(outlier: Boolean) = writeEvents(
      (1 to 99).map(_ => ("e", 10.0, ts)) ++
        Seq(("e", if (outlier) 100000.0 else 10.0, ts)))
    val hot = StatsQueries.queries("agg_winsorize")(spark, mk(true))
      .as[(String, Long, Long, Long, Double)].head()
    val cold = StatsQueries.queries("agg_winsorize")(spark, mk(false))
      .as[(String, Long, Long, Long, Double)].head()
    assert(cold._5 == 10.0 && cold._3 == 1000L && cold._4 == 1000L)
    // the outlier is clipped to p95 (=10.0) → winsorized mean stays 10
    assert(hot._5 == 10.0, s"winsorized: $hot")
    assert(hot._2 == 100L)
  }

  test("sample_balanced_classes: majority classes thin toward the minority count") {
    val ts = Timestamp.valueOf("2024-01-05 12:00:00")
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    // class a: 2000 rows, class b: 4000, class c (minority): 500
    val rows = (1L to 2000L).map(i => (i, "a")) ++
      (2001L to 6000L).map(i => (i, "b")) ++
      (6001L to 6500L).map(i => (i, "c"))
    rows.map { case (id, t) => (id, t, 1.0, ts) }
      .toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.CorpusQueries.queries("sample_balanced_classes")(spark, dir)
      .as[(String, Long, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> r).toMap
    // minority kept whole (ppm = 1e6), majorities near 500
    assert(out("c")._3 == 500L, out("c").toString)
    for (k <- Seq("a", "b")) {
      val kept = out(k)._3
      assert(math.abs(kept - 500L) < 100, s"$k kept $kept")
    }
    // determinism: second run produces identical checksums
    val again = graft.queries.CorpusQueries.queries("sample_balanced_classes")(spark, dir)
      .as[(String, Long, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out.forall { case (k, v) => again(k) == v._4 })
  }

  test("agg_bootstrap_ci: brackets the mean and is bit-deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    (1 to 1000).map(i => (i.toLong, 100.0 + (i % 100)))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r1 = StatsQueries.queries("agg_bootstrap_ci")(spark, dir)
      .as[(Long, Double, Double)].head()
    val r2 = StatsQueries.queries("agg_bootstrap_ci")(spark, dir)
      .as[(Long, Double, Double)].head()
    assert(r1 == r2, s"nondeterministic: $r1 vs $r2") // hash-seeded, not rand()
    assert(r1._1 == 64L)
    val trueMean = (1 to 1000).map(i => 100.0 + (i % 100)).sum / 1000
    assert(r1._2 <= trueMean && trueMean <= r1._3,
      s"CI [${r1._2}, ${r1._3}] vs mean $trueMean")
    assert(r1._2 < r1._3)
  }
}
