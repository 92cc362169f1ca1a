package graft

import java.sql.Timestamp

import graft.queries.{StreamQueries, TextQueries}

/** Semantics pins for the round-12 session-3 text/stream entries:
  * boilerplate n-gram detection (a template phrase shared by many docs is
  * flagged, unique content is not), the Zipf fit (an exact power-law
  * corpus recovers slope −1 with r² ≈ 1), and the streaming effect-size
  * monitor (a planted one-day shift fires on that day only; a day missing
  * an arm yields null).
  */
class TextSignalsSpec extends SparkSpec {
  import sqlImplicits._

  test("text_boilerplate_ngrams: template phrase flagged, unique content clean") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    val boiler = "all rights reserved contact us today"
    // 20 docs: 10 carry the 6-token template + unique filler, 10 are
    // fully unique → template 3-grams hit df=10 ≥ ceil(20·0.05)=1...
    // use 40 docs so the 5% threshold (=2) actually separates: unique
    // 3-grams have df=1 < 2, template ones df=20 ≥ 2.
    val docs = (1 to 20).map(i =>
      (i.toLong, s"$boiler u${i}a u${i}b u${i}c u${i}d")) ++
      (21 to 40).map(i => (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h u${i}i"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("text_boilerplate_ngrams")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val (templated, clean) = out.partition(_._1 <= 20)
    // template docs: the 4 template-internal 3-grams are boilerplate;
    // the bridge and filler 3-grams are unique
    assert(templated.forall(_._3 == 4), templated.take(3).toSeq.toString)
    assert(templated.forall(r => r._4 > 0.3 && r._4 < 0.6))
    assert(clean.forall(r => r._3 == 0 && r._4 == 0.0))
  }

  test("text_zipf_fit: an exact power-law corpus recovers slope -1, r2 ~ 1") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    // token w_r appears floor(12000/r) times, r = 1..150 → freq ∝ 1/r
    val tokens = (1 to 150).flatMap(r => Seq.fill(12000 / r)(f"w$r%03d"))
    // shuffle deterministically across 50 docs so frequencies, not
    // placement, carry the signal
    val docs = tokens.zipWithIndex.groupBy(_._2 % 50).toSeq.map {
      case (k, ts) => (k.toLong, ts.map(_._1).mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("text_zipf_fit")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out._1 == 150L && out._2 == 100L)
    assert(math.abs(out._3 + 1.0) < 0.02, s"slope ${out._3}")
    assert(out._5 > 0.999, s"r2 ${out._5}")
  }

  test("pipeline_tokenizer_fit: occurrence-counted pairs, dominant merge first") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    // "new york" appears 3 times WITHIN one doc and once in another —
    // occurrence counting (4), not doc-distinct (2), is the BPE rule
    Seq(
      (1L, "new york new york new york city"),
      (2L, "new york is big"),
      (3L, "tokyo is big"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CorpusQueries.queries("pipeline_tokenizer_fit")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (-r._2, r._1))
    assert(out.head._1 == "new york" && out.head._2 == 4, out.head.toString)
    // "york new" bridges the in-doc repeats: 2 occurrences
    assert(out.find(_._1 == "york new").exists(_._2 == 2))
    assert(out.head._3 == out.map(_._2).sum, s"totals: ${out.head}") // ≤20 pairs here
  }

  test("agg_tail_index: recovers a planted Pareto tail exponent") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    // exact Pareto(α=2) via inverse CDF on the uniform grid u=i/n:
    // x = u^(-1/2), scaled to cents-friendly magnitude
    val n = 5000
    val rows = (1 to n).map { i =>
      val u = i.toDouble / (n + 1)
      (i.toLong, 100.0 * math.pow(u, -0.5))
    }
    rows.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.queries.StatsQueries.queries("agg_tail_index")(spark, dir)
      .as[(Long, Long, Double, Double)].head()
    assert(out._1 == 100L)
    assert(math.abs(out._4 - 2.0) < 0.25, s"alpha ${out._4}")
    assert(math.abs(out._3 * out._4 - 1.0) < 1e-4, s"hill·alpha: $out")
  }

  test("stream_effect_size: planted one-day shift fires that day; missing arm → null") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    val base = Seq(10.0, 12.0, 14.0, 16.0)
    // day 1: arms identical → d = 0; day 2: purchase +20 → large d;
    // day 3: views only → null
    val rows =
      (for (v <- base; t <- Seq("purchase", "view")) yield
        (t, v, Timestamp.valueOf("2024-01-01 10:00:00"))) ++
      (for (v <- base) yield
        ("purchase", v + 20, Timestamp.valueOf("2024-01-02 10:00:00"))) ++
      (for (v <- base) yield
        ("view", v, Timestamp.valueOf("2024-01-02 10:00:00"))) ++
      (for (v <- base) yield
        ("view", v, Timestamp.valueOf("2024-01-03 10:00:00")))
    rows.toDF("event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StreamQueries.queries("stream_effect_size")(spark, dir)
      .as[(Timestamp, Long, Long, Option[Double])].collect().sortBy(_._1.getTime)
    assert(out.length == 3)
    assert(out(0)._4.contains(0.0), s"equal day: ${out(0)}")
    assert(out(1)._4.exists(_ > 5), s"shifted day: ${out(1)}")
    assert(out(2)._2 == 0 && out(2)._4.isEmpty, s"one-arm day: ${out(2)}")
  }

  test("text_burstiness: clumped token VMR ≫ evenly-spread token VMR = 0") {
    val dir = java.nio.file.Files.createTempDirectory("sig").toString
    // "even" once in all 10 docs (Poisson-flat → VMR 0); "bursty" in 4
    // docs with counts 9,1,1,1 (clumped → VMR = var/mean = 16/3)
    val docs =
      Seq((1L, "even " + Seq.fill(9)("bursty").mkString(" "))) ++
      (2L to 4L).map(i => (i, "even bursty")) ++
      (5L to 10L).map(i => (i, "even"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("text_burstiness")(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // moments run over ALL 10 corpus docs (zero counts included):
    // "even" has x=1 in every doc → mean 1, var 0, VMR 0
    assert(out("even") == (("even", 10L, 10L, 10L, 1.0, 0.0)),
      out("even").toString)
    // "bursty" counts (9,1,1,1,0×6): mean 1.2, var 69.6/9 → VMR 58/9
    val b = out("bursty")
    assert(b._2 == 4L && b._3 == 12L && b._4 == 10L && b._5 == 1.2 &&
      math.abs(b._6 - 58.0 / 9.0) < 1e-6, b.toString)
  }
}
