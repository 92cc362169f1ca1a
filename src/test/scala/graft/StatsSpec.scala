package graft

import graft.ops.Stats

class StatsSpec extends SparkSpec {
  import sqlImplicits._

  test("describe: hand-checked stats on a tiny frame") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val got = Stats.describe(df, Seq("x"))
      .as[(String, Double)].collect().toMap
    assert(got("count") == 4.0)
    assert(got("mean") == 2.5)
    assert(math.abs(got("std") - 1.290994) < 1e-6) // stddev_samp
    assert(got("min") == 1.0)
    assert(got("25%") == 1.75) // exact interpolated, pandas-style
    assert(got("50%") == 2.5)
    assert(got("75%") == 3.25)
    assert(got("max") == 4.0)
  }

  test("mode: ties are all returned, row-aligned, sorted by value") {
    // col a: 'x' and 'y' tie at 2; col b: single mode 9
    val df = Seq(("x", 9), ("x", 9), ("y", 9), ("y", 8), ("z", 7))
      .toDF("a", "b")
    val got = Stats.modeAll(df, Seq("a", "b"))
      .orderBy("row_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.length == 2)
    assert(got(0) == ((1, "x", "9")))
    assert(got(1) == ((2, "y", null))) // b padded with null on row 2
  }

  test("mode on single-mode columns gives one row") {
    val df = Seq(("x", 1), ("x", 1), ("y", 1)).toDF("a", "b")
    val got = Stats.modeAll(df, Seq("a", "b")).collect()
    assert(got.length == 1)
  }
}
