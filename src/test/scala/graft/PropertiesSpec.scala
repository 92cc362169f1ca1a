package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Dedupe
import graft.sink.SinkOps

/** Property-based laws from SURVEY §5.3: dedupe idempotence, dedupe+upsert
  * composition, parse/format round-trip. Uses ScalaCheck generators with
  * fixed seeds (no scalatestplus bridge in the offline cache) — each law
  * is checked over several generated cases, deterministically. */
class PropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(25, for {
      k <- Gen.choose(0, 5)
      v <- Gen.choose(0.0, 100.0)
    } yield (k, v)).map(_.zipWithIndex
      .map { case ((k, v), i) => (k, i, v) }) // unique arrival order

  private def cases[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: dedupe keep-last is idempotent") {
    cases(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val once = Dedupe.keepLast(df, Seq("k"), col("ord"))
      val twice = Dedupe.keepLast(once, Seq("k"), col("ord"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("property: sequential upserts equal one deduped upsert (keep-last)") {
    cases(rowsGen, 5).foreach { rows =>
      val (first, second) = rows.splitAt(rows.size / 2)
      val base = spark.emptyDataset[(Int, Int, Double)].toDF("k", "ord", "v")
      def ded(xs: List[(Int, Int, Double)]) =
        Dedupe.keepLast(xs.toDF("k", "ord", "v"), Seq("k"), col("ord"))
      val sequential = SinkOps.logicalUpsert(
        SinkOps.logicalUpsert(base, ded(first), Seq("k")),
        ded(second), Seq("k"))
      val global = Dedupe.keepLast(rows.toDF("k", "ord", "v"),
        Seq("k"), col("ord"))
      assert(sequential.select("k", "v").collect().toSet ==
        global.select("k", "v").collect().toSet)
    }
  }

  private val cdcGen: Gen[List[(Int, String, String, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 6)
      op <- Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D"))
      v <- Gen.alphaLowerStr.map(_.take(4))
    } yield (k, v, op)).map(_.zipWithIndex
      .map { case ((k, v, op), i) => (k, v, op, i.toLong) }) // ts = arrival

  test("property: CDC apply composes — split-by-time apply equals " +
      "whole-log apply") {
    cases(cdcGen, 5).foreach { chg =>
      val snap = Seq((0, "s0"), (1, "s1"), (2, "s2")).toDF("k", "v")
      def df(xs: List[(Int, String, String, Long)]) =
        xs.toDF("k", "v", "op", "ts")
      // any time boundary respects per-key order, so sequential batches
      // must compose to the single global latest-pick
      val (first, second) = chg.partition(_._4 < chg.size / 2)
      val sequential = SinkOps.cdcApply(
        SinkOps.cdcApply(snap, df(first), Seq("k"), Seq("ts")),
        df(second), Seq("k"), Seq("ts"))
      val whole = SinkOps.cdcApply(snap, df(chg), Seq("k"), Seq("ts"))
      assert(sequential.collect().toSet == whole.collect().toSet)
    }
  }

  private val scd2BatchGen: Gen[List[(Long, Option[String])]] =
    Gen.listOfN(8, for {
      k <- Gen.choose(0L, 4L)
      v <- Gen.option(Gen.oneOf("a", "b", "c"))
    } yield (k, v)).map(_.distinctBy(_._1)) // one update per key per batch

  test("property: SCD2 invariants survive random sequential merges") {
    val effTs = (1 to 3).map(i =>
      java.sql.Timestamp.valueOf(s"2025-0$i-01 00:00:00"))
    cases(Gen.listOfN(3, scd2BatchGen), 5).foreach { batches =>
      var dim = spark.emptyDataset[(Long, Option[String],
          java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
        .toDF("k", "attr", "valid_from", "valid_to", "is_current")
      batches.zip(effTs).foreach { case (b, ts) =>
        if (b.nonEmpty)
          dim = SinkOps.scd2Merge(dim, b.toDF("k", "attr"), Seq("k"),
            Seq("attr"), org.apache.spark.sql.functions.lit(ts))
      }
      val rows = dim.as[(Long, Option[String], java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)].collect()
      rows.groupBy(_._1).foreach { case (k, vs) =>
        // exactly one open version per key, and it is the newest
        val open = vs.filter(_._5)
        assert(open.length == 1, s"key $k open versions: ${open.length}")
        assert(open.head._4.isEmpty, s"key $k open version has valid_to")
        assert(open.head._3 == vs.map(_._3).max,
          s"key $k open version is not the newest")
        // closed versions chain: each valid_to equals the next
        // version's valid_from — no gaps, no overlaps
        val sorted = vs.sortBy(_._3.getTime)
        sorted.sliding(2).foreach {
          case Array(prev, next) =>
            assert(!prev._5 && prev._4.contains(next._3),
              s"key $k: broken version chain at ${prev._3}")
          case _ =>
        }
        // no duplicate version starts
        assert(vs.map(_._3).distinct.length == vs.length)
      }
    }
  }

  test("property: pivot cells conserve the per-group totals") {
    val d = sfDir("0.001")
    val piv = SparkEntry.queries("agg_pivot")(spark, d)
      .withColumn("cells", col("n_f") + col("n_o") + col("n_p"))
    val totals = Tables.orders(spark, d)
      .groupBy(month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("total"))
    assert(piv.join(totals, "m")
      .filter(col("cells") =!= col("total")).count() == 0)
  }

  test("property: stratified sample is reproducible for a fixed seed") {
    val events = Tables.events(spark, sfDir("0.001"))
    val fr = Map("click" -> 0.5, "view" -> 0.1, "purchase" -> 1.0,
      "signup" -> 0.25, "error" -> 0.0)
    def ids() = events.stat.sampleBy("event_type", fr, seed = 7L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids() == ids()) // per-row seeded Bernoulli — replay-identical
  }

  test("property: packSequences offsets are exact prefix sums — " +
      "contiguous per group, no gaps, no overlap") {
    val docsGen: Gen[List[(Long, String, Int)]] =
      Gen.listOfN(40, for {
        g <- Gen.oneOf("en", "fr", "de")
        n <- Gen.choose(1, 30) // tokens per doc
      } yield (g, n)).map(_.zipWithIndex.map { case ((g, n), i) =>
        (i.toLong, g, n) })
    cases(docsGen, 3).foreach { docs =>
      val df = docs.map { case (id, g, n) =>
        (id, g, (1 to n).map("w" + _).mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      val got = graft.ops.CorpusOps
        .packSequences(df, "doc_id", "lang", "text", budgetTokens = 16)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      got.groupBy(_._2).foreach { case (_, rows) =>
        val byId = rows.sortBy(_._1)
        // each doc starts exactly where the previous one ended
        byId.foldLeft(0L) { case (expect, (_, _, n, off, bin)) =>
          assert(off == expect, "offset must be the running prefix sum")
          assert(bin == off / 16, "bin = first-token chunk")
          off + n
        }
      }
      // n_tokens faithful to the text
      got.foreach { case (id, _, n, _, _) =>
        assert(n == docs.find(_._1 == id).get._3.toLong)
      }
    }
  }

  test("property: exact-moment skewness is 0 on symmetric data, " +
      "sign-flips under reflection") {
    // symmetric multiset around m ⇒ m3 = 0 EXACTLY (integer sums), so
    // skew = 0.0 with no tolerance needed — the whole point of exact
    // power sums
    val symGen = Gen.listOfN(12, Gen.choose(1, 5000)).map(_.flatMap(d =>
      List(100000 + d, 100000 - d)))
    cases(symGen, 4).foreach { cents =>
      val df = cents.map(c => ("g", c / 100.0)).toDF("g", "v")
      val row = graft.ops.Stats.skewKurtExact(df, Seq("g"), "v")
        .select("skew").as[Double].collect()(0)
      assert(row == 0.0, s"symmetric data skew = $row, want exact 0")
    }
    // reflection v -> 2m - v negates skewness exactly
    val asymGen = Gen.listOfN(20, Gen.choose(1, 200000))
    cases(asymGen, 4).foreach { cents =>
      val df = cents.map(c => ("g", c / 100.0)).toDF("g", "v")
      val refl = cents.map(c => ("g", (400000 - c) / 100.0)).toDF("g", "v")
      def skew(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Stats.skewKurtExact(d, Seq("g"), "v")
          .select("skew").as[Double].collect()(0)
      assert(skew(df) == -skew(refl), "reflection must negate skewness")
    }
  }

  test("property: resampleInterp on a gap-free series returns the " +
      "bucket means unchanged") {
    val gen = Gen.listOfN(30, Gen.choose(0.0, 100.0))
    cases(gen, 4).foreach { vs =>
      // one value per consecutive hour: grid == buckets, zero gaps
      val rows = vs.zipWithIndex.map { case (v, i) =>
        ("s", new java.sql.Timestamp(1704067200000L + i * 3600000L), v) }
      val df = rows.toDF("g", "dt", "v")
      val got = graft.ops.TimeSeries
        .resampleInterp(df, "dt", "H", Seq("g"), avg($"v"), "v")
        .select("dt", "v", "was_gap")
        .as[(java.sql.Timestamp, Double, Boolean)].collect()
      assert(got.forall(!_._3), "no gaps expected")
      val byTs = got.map(r => (r._1.getTime, r._2)).toMap
      rows.foreach { case (_, ts, v) =>
        assert(byTs(ts.getTime) == v, "known buckets must pass through")
      }
    }
  }

  test("property: binned band join equals brute force") {
    val gen = Gen.listOfN(40, Gen.choose(0L, 3000L))
    cases(gen, 4).foreach { cs =>
      val rows = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      val df = rows.toDF("id", "cents")
      val band = 500L
      val binned = df.withColumn("bin", expr(s"cents div $band"))
      val probe = binned.withColumn("bin",
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
      val got = probe.as("a").join(binned.as("b"),
          col("a.bin") === col("b.bin") &&
          abs(col("b.cents") - col("a.cents")) <= band &&
          col("a.id") =!= col("b.id"))
        .groupBy(col("a.id")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val brute = rows.map { case (i, c) =>
        i -> rows.count { case (j, c2) =>
          j != i && math.abs(c2 - c) <= band }.toLong
      }.filter(_._2 > 0).toMap
      assert(got == brute, "bin replication must find exactly the band pairs")
    }
  }

  test("property: ts format/parse round-trips across the 4 formats") {
    val fmts = graft.ingest.CsvIngest.DefaultFormats
    val tsGen = Gen.choose(0L, 4102444800L).map(_ * 1000L) // whole seconds
    val batch = cases(Gen.listOfN(8, tsGen), 4).flatten
    fmts.indices.foreach { fmtIdx =>
      val df = batch.map(new java.sql.Timestamp(_)).toDF("ts")
      val bad = df.select(
          graft.ingest.CsvIngest.parseTs(
            date_format(col("ts"), fmts(fmtIdx))).as("rt"), col("ts"))
        .filter(col("rt") =!= col("ts") || col("rt").isNull)
      assert(bad.count() == 0, s"format ${fmts(fmtIdx)} did not round-trip")
    }
  }
}
