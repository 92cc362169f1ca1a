package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
        round(avg(col(c)), 6).as(s"${c}__mean"),
        round(stddev_samp(col(c)), 6).as(s"${c}__std"),
        min(col(c)).cast("double").as(s"${c}__min"),
        round(expr(s"percentile($c, 0.25)"), 6).as(s"${c}__p25"),
        round(expr(s"percentile($c, 0.5)"), 6).as(s"${c}__p50"),
        round(expr(s"percentile($c, 0.75)"), 6).as(s"${c}__p75"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
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
    val aligned = cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("n"))
      val maxN = counts.agg(max(col("n")).as("max_n"))
      counts.join(broadcast(maxN), col("n") === col("max_n"))
        .select(col("v").as(c))
        .withColumn("__row", row_number().over(Window.orderBy(col(c))))
    }
    val joined = aligned.reduce { (l, r) =>
      l.join(r, Seq("__row"), "full_outer")
    }
    joined.withColumnRenamed("__row", "row_idx")
      .select((Seq("row_idx") ++ cols).map(col): _*)
  }
}
