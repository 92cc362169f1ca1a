package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.ops.Layout

/** Measures what the z-order layout is FOR — SYMMETRIC pruning. A
  * single-column sort prunes its own column's stripes brilliantly and
  * the other column's not at all (a y-only predicate reads the whole
  * table); the z-order interleave gives every file a z-interval whose
  * bits split between BOTH dimensions, so either dimension's stripe
  * prunes to a fraction, at the price of the favorable-dimension query
  * fragmenting somewhat (measured here: comparable to the linear
  * stripe at 64-file granularity — z-order is not a free win on the
  * sorted column, it is insurance across query dimensions). The scan
  * node's numOutputRows IS the rows surviving parquet row-group
  * min/max pruning (record-level parquet filtering is off by
  * default), so the assertions are on actual skipping, not plan
  * text. */
class ZOrderLayoutSpec extends SparkSpec {

  private val root = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")
  private val dir = Seq(s"$root/sf0.1", s"$root/sf0.01")
    .find(d => new java.io.File(s"$d/orders.parquet").exists())

  private def scanRows(path: String, cond: Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(cond)
      .select("o_orderkey")
    // execute THIS dataframe's plan (count() would plan a separate
    // query and leave these metrics untouched), then read the scan
    // node's numOutputRows off the executed plan
    val n = df.collect().length.toLong
    val scanned = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
    (scanned, n)
  }

  test("zValue interleaves and orders locally: unit bits") {
    import sqlImplicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (2L, 0L), (65535L, 65535L)).toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16)
        .as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bit i of x -> 2i, bit i of y -> 2i+1
    assert(rows == Set((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (1L, 1L, 3L), (2L, 0L, 4L), (65535L, 65535L, 4294967295L)))
  }

  test("2-D predicate: z-ordered layout skips row groups that the " +
      "linear sort and unsorted layouts must read") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val orders = spark.read.parquet(s"${dir.get}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val total = orders.count()

    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    // unsorted: as read; linear: classic single-column sort; zorder:
    // the 2-D clustering under test. 64 files each, one row group per
    // file at this size.
    orders.repartition(64).write.mode("overwrite")
      .parquet(s"$base/unsorted")
    orders.repartitionByRange(64, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.writeZOrdered(orders, "o_custkey", "o_totalprice", 64,
      s"$base/zorder")

    // all three layouts carry the same rows
    for (l <- Seq("unsorted", "linear", "zorder"))
      assert(spark.read.parquet(s"$base/$l").count() == total, l)

    // ~1/8 stripes of each dimension; the 2-D query is their rectangle
    val condX = col("o_custkey").between(7000, 8800)
    val condY = col("o_totalprice").between(240000.0, 300000.0)

    val was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // result identity: every layout answers every query identically
      for (c <- Seq(condX, condY, condX && condY)) {
        val ns = Seq("unsorted", "linear", "zorder")
          .map(l => scanRows(s"$base/$l", c)._2)
        assert(ns.distinct.size == 1 && ns.head > 0, ns.toString)
      }
      // unsorted: every row group spans both value ranges — nothing
      // is ever skipped
      assert(scanRows(s"$base/unsorted", condX && condY)._1 == total)

      // linear (sorted by custkey): the x-stripe prunes well…
      val liX = scanRows(s"$base/linear", condX)._1
      assert(liX < total / 4, s"linear x-stripe scanned $liX")
      // …but a price-only predicate reads the ENTIRE table — the
      // single-column sort has no second dimension to offer
      val liY = scanRows(s"$base/linear", condY)._1
      assert(liY == total, s"linear y scanned $liY of $total")

      // z-order: BOTH single-dimension stripes prune (each dimension
      // holds half the bits of every file's z-interval), and the 2-D
      // rectangle prunes at least as well as its best stripe
      val zoX = scanRows(s"$base/zorder", condX)._1
      val zoY = scanRows(s"$base/zorder", condY)._1
      val zo2 = scanRows(s"$base/zorder", condX && condY)._1
      assert(zoX < total / 2, s"zorder x scanned $zoX")
      assert(zoY < total / 2, s"zorder y scanned $zoY")
      assert(zo2 <= math.min(zoX, zoY), s"$zo2 vs $zoX/$zoY")
      // the headline: worst-case single-dimension query cost drops
      // from "full table" (linear) to a fraction (z-order)
      assert(math.max(zoX, zoY) * 2 < math.max(liX, liY),
        s"z worst ${math.max(zoX, zoY)} vs linear worst $liY")
      info(s"scanned rows of $total — linear: x=$liX y=$liY; " +
        s"zorder: x=$zoX y=$zoY 2d=$zo2")
    } finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }

  test("scan_zorder_prune registry entry: both rectangle predicates " +
      "reach the layout's parquet scan, and row groups actually skip") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("scan_zorder_prune")(spark, dir.get)
      val out = df.collect()
      assert(out.nonEmpty)
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.size == 1, scans.toString)
      // both dimensions' range predicates are PUSHED to the scan —
      // the property that lets parquet min/max footers prune over the
      // z-clustered files
      val pushed = scans.head.metadata("PushedFilters")
      for (c <- Seq("o_custkey", "o_totalprice");
           op <- Seq("GreaterThanOrEqual", "LessThanOrEqual"))
        assert(pushed.contains(s"$op($c"), s"$op($c missing in $pushed")
      // and the pruning is real: the scan reads a fraction of the
      // table, not all of it (the rectangle is ~1/3 of custkey ×
      // ~1/3 of price)
      val total = spark.read.parquet(s"${dir.get}/orders.parquet").count()
      val scanned = scans.head.metrics("numOutputRows").value
      assert(scanned < (total * 3) / 4,
        s"scan read $scanned of $total rows — no row-group skipping")
      info(s"entry scan read $scanned of $total rows after pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }
}
