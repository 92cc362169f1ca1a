package graft

import java.sql.Timestamp

import graft.queries.StatsQueries

/** Planted-drift test for agg_kl_drift: a type whose value distribution
  * shifts between the month halves must score a much larger KL(Q‖P)
  * than a type whose distribution is unchanged (the Laplace smoothing
  * keeps the stable type near — but, with finite counts, not exactly —
  * zero).
  */
class KlDriftSpec extends SparkSpec {
  import sqlImplicits._

  test("planted second-half shift dominates a stable type's KL") {
    // stable: value 10.0 both halves. drifted: 10.0 first half, 210.0
    // second half (different 5000-cent bin: bin 0 -> bin 4).
    val rows = for {
      half <- Seq(true, false)
      i <- 0 until 50
      tpe <- Seq("stable", "drifted")
    } yield {
      val ts = if (half) Timestamp.valueOf("2024-01-10 00:00:00")
        else Timestamp.valueOf("2024-01-20 00:00:00")
      val v = if (tpe == "drifted" && !half) 210.0 else 10.0
      ((i + (if (half) 0 else 1000)).toLong, ts, 1L, tpe, v, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("kl").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsQueries.queries("agg_kl_drift")(spark, dir)
      .as[(String, Long, Long, Double)].collect().map {
        case (t, np, nq, kl) => t -> ((np, nq, kl))
      }.toMap
    assert(got.keySet == Set("stable", "drifted"))
    val (np, nq, klDrift) = got("drifted")
    assert(np == 50L && nq == 50L)
    val klStable = got("stable")._3
    // total mass moved a bin: KL(Q||P) ~ ln(smoothed ratio) ~ ln(51/1)
    assert(klDrift > 1.0, s"drifted KL $klDrift")
    assert(klStable.abs < 0.01, s"stable KL $klStable")
    assert(klDrift > 50 * klStable.abs.max(1e-9))
  }
}
