package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.StableRound

/** The reference's stats operators (`datapump.py:329-371`):
  * `describe(include='all')` and tie-faithful `df.mode()`.
  */
object Stats {

  /** pandas-describe-shaped stat table over numeric columns: one string
    * `stat` column + one double column per input column, rows
    * count/mean/std/min/25%/50%/75%/max (reference `datapump.py:331-336`).
    *
    * One distributed aggregation pass computes every cell (partial aggs +
    * single shuffle), then `stack` pivots the single row into stat rows —
    * no driver-side collect. Quantiles are exact `percentile` (linearly
    * interpolated, matching pandas and DuckDB `quantile_cont`); at 100 TB
    * swap for `approx_percentile` — exactness here is for oracle parity
    * (SURVEY §7 hard part 3).
    */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"${c}__count"),
        StableRound.round6(avg(col(c))).as(s"${c}__mean"),
        round(stddev_samp(col(c)), 6).as(s"${c}__std"),
        min(col(c)).cast("double").as(s"${c}__min"),
        // ONE percentile aggregate per column for all three quantiles:
        // each percentile call buffers the column's values independently,
        // so the array form cuts the dominant sort/merge cost 3×
        expr(s"percentile($c, array(0.25, 0.5, 0.75))").as(s"${c}__pq"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
      .select(cols.flatMap { c =>
        Seq(col(s"${c}__count"), col(s"${c}__mean"), col(s"${c}__std"),
          col(s"${c}__min"),
          round(element_at(col(s"${c}__pq"), 1), 6).as(s"${c}__p25"),
          round(element_at(col(s"${c}__pq"), 2), 6).as(s"${c}__p50"),
          round(element_at(col(s"${c}__pq"), 3), 6).as(s"${c}__p75"),
          col(s"${c}__max"))
      }: _*)
    val statLabels = Seq(
      "count" -> "count", "mean" -> "mean", "std" -> "std", "min" -> "min",
      "25%" -> "p25", "50%" -> "p50", "75%" -> "p75", "max" -> "max")
    val stackArgs = statLabels.map { case (label, suffix) =>
      s"'$label', " + cols.map(c => s"`${c}__$suffix`").mkString(", ")
    }.mkString(", ")
    one.selectExpr(
      s"stack(${statLabels.size}, $stackArgs) AS (stat, ${cols.mkString(", ")})")
  }

  /** Tie-faithful per-column mode matrix — pandas `df.mode()`
    * (reference `datapump.py:337-341`): for each column, ALL values tied
    * for the max count, row-aligned across columns by per-column rank
    * (values stringified, shorter columns padded with null).
    *
    * The global `row_number` window runs over the tied values only (at most
    * |distinct values of one column| rows after the max-count filter), so
    * the single-partition window is bounded, not data-sized.
    */
  def modeAll(df: DataFrame, cols: Seq[String]): DataFrame = {
    // long format — ONE scan of the input for all columns (the previous
    // shape re-scanned the table once per column): explode each row into
    // (column, value) pairs, count by pair, keep per-column max-count ties
    // via a broadcast of the per-column maxima, rank ties, pivot back.
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
    val counts = pairs.groupBy("c", "v").agg(count(lit(1)).as("n"))
    val maxes = counts.groupBy("c").agg(max("n").as("max_n"))
    val tied = counts.join(broadcast(maxes), "c")
      .filter(col("n") === col("max_n"))
    // the rank window runs over tied values only (bounded, not data-sized)
    val ranked = tied.withColumn("row_idx", row_number().over(
      Window.partitionBy("c").orderBy("v")))
    ranked.groupBy("row_idx").pivot("c", cols).agg(first("v"))
      .select((Seq("row_idx") ++ cols).map(col): _*)
  }
}
