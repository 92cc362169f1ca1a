package graft

import java.sql.Timestamp

import graft.queries.StatsQueries

/** Planted-level-shift test for agg_cusum_changepoint: the integer
  * cross-multiplied CUSUM statistic must place the change point on the
  * last pre-shift day, and a constant series must pick its first day
  * via the (|D| DESC, day ASC) tie order.
  */
class CusumSpec extends SparkSpec {
  import sqlImplicits._

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double,
      String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("CUSUM argmax lands on the last day before a planted level shift") {
    // 20 days x 3 rows/day; value 10.0 on days 0-9, 20.0 on days 10-19.
    // mean_<=k deviates most from the grand mean at k = day 9, so the
    // cross-multiplied |cumS_k*N - S*cumN_k| peaks exactly there.
    val rows = for {
      day <- 0 until 20
      j <- 0 until 3
    } yield {
      val v = if (day < 10) 10.0 else 20.0
      ((day * 3 + j).toLong,
        Timestamp.valueOf(f"2024-03-${day + 1}%02d 0$j:00:00"),
        1L, "shift", v, "{}")
    }
    val got = StatsQueries.queries("agg_cusum_changepoint")(
      spark, eventsDir(rows))
      .as[(String, Long, Long, Long, Timestamp)].collect()
    assert(got.length == 1)
    val (tpe, nEvents, nDays, dMax, cpDay) = got(0)
    assert(tpe == "shift" && nEvents == 60L && nDays == 20L)
    assert(cpDay == Timestamp.valueOf("2024-03-10 00:00:00"))
    // exact integer check: at k=9, cums=10*3*1000 cents... sd is cents:
    // cums = 10 days * 3 rows * 1000 = 30000, cumn = 30, S = 90000, N = 60
    // D = |30000*60 - 90000*30| = 900000
    assert(dMax == 900000L)
  }

  test("constant series ties break to the earliest day") {
    val rows = for {
      day <- 0 until 5
    } yield (day.toLong,
      Timestamp.valueOf(f"2024-03-${day + 1}%02d 00:00:00"),
      1L, "flat", 7.0, "{}")
    val got = StatsQueries.queries("agg_cusum_changepoint")(
      spark, eventsDir(rows))
      .as[(String, Long, Long, Long, Timestamp)].collect()
    assert(got.length == 1)
    val (_, _, nDays, dMax, cpDay) = got(0) match {
      case (t, n, d, dm, cp) => (t, n, d, dm, cp)
    }
    assert(nDays == 5L && dMax == 0L)
    assert(cpDay == Timestamp.valueOf("2024-03-01 00:00:00"))
  }
}
