package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional data clustering for
  * scan-time skipping. At 100 TB the cheapest predicate is the one
  * whose row groups are never read — partition dirs prune ONE
  * low-cardinality dimension, but range queries over two numeric
  * dimensions (customer × price, time × key, lat × lon) need the rows
  * CLUSTERED so that every parquet row group covers a small rectangle
  * of the value space; then footer min/max statistics prune BOTH
  * dimensions at once.
  *
  * [[zValue]] is the Morton (z-order) interleave — a pure bit
  * expression (whole-stage codegen'd, no UDF); [[writeZOrdered]]
  * range-partitions and sorts by it, which is exactly the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` recipe re-expressed with stock Spark
  * operators. The win is SYMMETRY, not magic (measured in
  * ZOrderLayoutSpec at sf0.1, 64 files): a custkey-sorted layout scans
  * 13% for a custkey stripe but 100% for a price stripe; the z-ordered
  * layout scans 30-40% for EITHER stripe and 14% for their rectangle —
  * worst-case single-dimension cost drops from full-table to a
  * fraction, at the price of fragmenting the favorable dimension.
  *
  * Reference scope analog: `datapump.py` leaves layout to the target
  * store (Entry 3's datastore_create); a Spark-native engine owns its
  * file layout, so this is part of the sink tier (SURVEY §2.6).
  */
object Layout {

  /** Morton z-value of two dimensions already scaled to [0, 2^bits):
    * bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    * shift/and/or tree — codegen-friendly, engine-neutral (the oracle
    * spells the identical arithmetic in SQL). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val xb = shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)),
        2 * i)
      val yb = shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)),
        2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)

  /** Min-max scale a numeric column to the integer grid [0, 2^bits):
    * `lo`/`hi` come in as plain doubles (computed once, broadcast by
    * the caller) so the scaling stays a map-only expression. */
  def gridScale(c: Column, lo: Double, hi: Double,
      bits: Int = 16): Column =
    gridScale(c, lit(lo), lit(hi), bits)

  /** Column-bound variant for callers that keep the bounds row in the
    * plan (one broadcast agg row cross-joined in) instead of collecting
    * it — the expression order is pinned so the oracle's IEEE double
    * arithmetic lands bit-identically. */
  def gridScale(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = (1L << bits) - 1
    least(lit(cells),
      floor((c.cast("double") - lo) / (hi - lo) * cells)
        .cast("long"))
  }

  /** Land `df` clustered by the z-curve over (`xCol`, `yCol`):
    * range-partition into `numFiles` z-runs, sort within each, write
    * one file per run — every file then covers a compact z-interval,
    * i.e. a small rectangle stack of the (x, y) plane, and parquet
    * min/max footers prune 2-D range predicates at row-group level.
    * The two dimension bounds are computed in ONE pass and broadcast
    * into the map-side scaling expression; the only shuffle is the
    * range partitioner's. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, outDir: String, bits: Int = 16): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double"))
      .head
    val z = zValue(
      gridScale(col(xCol), b.getDouble(0), b.getDouble(1), bits),
      gridScale(col(yCol), b.getDouble(2), b.getDouble(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
