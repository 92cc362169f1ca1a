package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling — the reference's
  * `data_df.groupby(GroupBy).resample(Kind).mean()` (`datapump.py:287-327`,
  * core at `:294`), re-expressed as declarative group-aggregation so Catalyst
  * plans a single partial-agg + shuffle + final-agg (map-side combine for
  * free; no per-group driver loop).
  *
  * Frequency aliases follow pandas offset aliases (`datapump.py:386-392`
  * validates via `to_offset`): fixed-width (`S`, `T`/`min`, `H`, `D` and
  * integer multiples like `15T`) map to `window(ts, dur)`; calendar
  * frequencies (`W`, `M`, `Q`, `A`/`Y`) map to `date_trunc`.
  *
  * Documented deviations from pandas (SURVEY §2.4): buckets are labeled at
  * the *start* (pandas labels `M`/`Q`/`A` at period end); weeks are ISO
  * Monday-anchored via `date_trunc('week')` (pandas `W` is Sunday-anchored);
  * empty buckets between min and max are not emitted (pandas emits NaN rows
  * that the sparse-record sink then strips to key-only records).
  */
object TimeSeries {

  /** Batch sessionization (gaps-and-islands): a new session starts when
    * the gap from the key's previous event is ≥ `gapMinutes`. The BATCH
    * twin of the streaming `session_window` tier — same one-shuffle
    * shape as any window chain (hash by key, sort by ts), emitting
    * (key, session_start=min ts, session_end=max ts, n_events). At
    * 100 TB this is one hash exchange of the event rows — the same cost
    * class as win_running_total — with no state store needed because
    * history is bounded by the partition sort. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    // exact-microsecond gap test (sub-second precision must not truncate)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev)
        >= gapMinutes * 60L * 1000000L, 1).otherwise(0)
    events
      .withColumn("__sid", sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  private val FreqPattern = "^(\\d*)\\s*([A-Za-z]+)$".r

  /** Fixed-width window duration string for a pandas alias, or None for
    * calendar frequencies (which need `date_trunc`). */
  private def parse(freq: String): Either[String, String] = freq match {
    case FreqPattern(mult, unit) =>
      val n = if (mult.isEmpty) 1 else mult.toInt
      unit match {
        case "S" | "s" | "sec"         => Left(s"$n seconds")
        case "T" | "t" | "min"         => Left(s"$n minutes")
        case "H" | "h"                 => Left(s"$n hours")
        case "D" | "d"                 => Left(s"$n days")
        case "W" | "w" if n == 1       => Right("week")
        case "M" if n == 1             => Right("month")
        case "Q" | "q" if n == 1       => Right("quarter")
        case "A" | "Y" | "y" if n == 1 => Right("year")
        case _ => throw new IllegalArgumentException(
          s"unsupported frequency alias: $freq")
      }
    case _ => throw new IllegalArgumentException(
      s"unsupported frequency alias: $freq")
  }

  /** Per-group time-bucket aggregation with arbitrary aggregate columns.
    * Output columns: groupCols ++ (tsCol = bucket start) ++ agg outputs.
    */
  def resampleAgg(df: DataFrame, tsCol: String, freq: String,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val gcols = groupCols.map(col)
    parse(freq) match {
      case Left(dur) =>
        // window() is epoch-aligned, identical to date_trunc for whole
        // units in UTC, and generalizes to multiples like "15 minutes".
        val agged = df.groupBy(gcols :+ window(col(tsCol), dur): _*)
          .agg(aggs.head, aggs.tail: _*)
        val aggNames = agged.columns
          .filterNot(n => n == "window" || groupCols.contains(n))
        agged.withColumn(tsCol, col("window.start"))
          .drop("window")
          .select((groupCols ++ Seq(tsCol) ++ aggNames).map(col): _*)
      case Right(unit) =>
        df.groupBy(gcols :+ date_trunc(unit, col(tsCol)).as(tsCol): _*)
          .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Per-group time-bucket mean of the given value columns — the
    * reference's exact operation (numeric-only mean per bucket). */
  def resampleMean(df: DataFrame, tsCol: String, freq: String,
      groupCols: Seq[String], valueCols: Seq[String]): DataFrame =
    resampleAgg(df, tsCol, freq, groupCols,
      valueCols.map(c => avg(col(c)).as(c)))

  /** Ordered event-funnel per key: stage k's first instant is the min
    * event time of stage k's type AT OR AFTER stage k-1's first instant
    * (strictly ordered progress — a purchase before the first qualifying
    * click does not count). Emits one row per key with `first_<stage>`
    * timestamps (null once the funnel stalls) and `depth` = number of
    * stages reached.
    *
    * Shape: a chain of whole-partition window mins over ONE hash
    * exchange on the key — no ordering clause, so no sort; each stage's
    * gate reads the previous stage's materialized column; the final
    * per-key collapse reuses the same partitioning. At 100 TB this is
    * the cost class of a single groupBy(key): no joins, no repeated
    * scans, state O(#stages) per row. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(keyCol)
    val outCols = stages.map(st => s"first_$st")
    val staged = stages.zipWithIndex.foldLeft(df) {
      case (acc, (st, i)) =>
        val gate = if (i == 0) col(typeCol) === st
          else col(typeCol) === st && col(tsCol) >= col(outCols(i - 1))
        acc.withColumn(outCols(i), min(when(gate, col(tsCol))).over(w))
    }
    // wrap forward so the OUTERMOST when tests the deepest stage (every
    // reached stage implies all shallower ones are non-null)
    val depth = outCols.zipWithIndex.foldLeft(lit(0)) {
      case (els, (c, i)) => when(col(c).isNotNull, lit(i + 1)).otherwise(els)
    }
    staged.groupBy(col(keyCol))
      .agg(min(outCols.head).as(outCols.head),
        outCols.tail.map(c => min(c).as(c)): _*)
      .withColumn("depth", depth)
  }

  /** Dense-grid resample with FORWARD FILL — pandas
    * `resample(freq).mean().ffill()`. Closes the one documented deviation
    * of [[resampleAgg]] (empty buckets between a group's min and max are
    * not emitted): every bucket on the per-group grid is emitted, gaps
    * carry the most recent real bucket's value, and `was_gap` marks
    * filled rows (the sparse-record sink can drop them; a training
    * pipeline can weight them).
    *
    * Shape (fixed-width frequencies only — a dense calendar grid is
    * ill-defined under variable-width buckets): one input-sized shuffle
    * for the bucket aggregation, then everything downstream is GRID-
    * sized (groups × buckets), not input-sized — the per-group bounds
    * agg is a rollup of the already-aggregated buckets, the grid itself
    * is a map-side `sequence`/`explode` of one row per group, and the
    * left join + fill window shuffle grid rows only. At 100 TB of
    * events the grid is bounded by (#groups × time-range/freq)
    * regardless of event volume, so the fill stages cost what a report
    * costs, not what a scan costs. The fill window's frame is
    * unbounded-preceding but `last(_, ignoreNulls)` keeps O(1) state
    * per row — no full-frame rescan. */
  def resampleFfill(df: DataFrame, tsCol: String, freq: String,
      groupCols: Seq[String], agg: Column, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = parse(freq) match {
      case Left(d) => d
      case Right(u) => throw new IllegalArgumentException(
        s"resampleFfill needs a fixed-width frequency, got calendar '$u'")
    }
    val gcols = groupCols.map(col)
    val bucketed = resampleAgg(df, tsCol, freq, groupCols, Seq(agg.as(outCol)))
    val bounds = bucketed.groupBy(gcols: _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(gcols :+ explode(sequence(col("__lo"),
      col("__hi"), expr(s"INTERVAL $dur"))).as(tsCol): _*)
    val w = Window.partitionBy(gcols: _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, groupCols :+ tsCol, "left")
      .withColumn("was_gap", col(outCol).isNull)
      .withColumn(outCol, last(col(outCol), ignoreNulls = true).over(w))
  }

  /** [[resampleFfill]]'s sibling with pandas `interpolate()` gap
    * semantics: interior gaps are filled LINEARLY between the
    * surrounding known buckets, trailing gaps hold the last known value,
    * leading gaps stay null (pandas limit_direction='forward' default).
    *
    * Same grid-sized cost shape as ffill. The two fill windows (backward
    * last-known, forward first-known) share one partitioning AND one
    * ascending sort, so Catalyst stacks them on a single exchange+sort —
    * no second shuffle for the forward pass. The interpolation itself is
    * a straight-line IEEE sequence (µs-long deltas → one division, one
    * multiply, one add), identical on any engine; at a known bucket the
    * fraction is exactly 0 so the bucket's own value is reproduced
    * bit-for-bit. */
  def resampleInterp(df: DataFrame, tsCol: String, freq: String,
      groupCols: Seq[String], agg: Column, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = parse(freq) match {
      case Left(d) => d
      case Right(u) => throw new IllegalArgumentException(
        s"resampleInterp needs a fixed-width frequency, got calendar '$u'")
    }
    val gcols = groupCols.map(col)
    val bucketed = resampleAgg(df, tsCol, freq, groupCols, Seq(agg.as(outCol)))
    val bounds = bucketed.groupBy(gcols: _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(gcols :+ explode(sequence(col("__lo"),
      col("__hi"), expr(s"INTERVAL $dur"))).as(tsCol): _*)
    val back = Window.partitionBy(gcols: _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(gcols: _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownTs = when(col(outCol).isNotNull, col(tsCol))
    val t = unix_micros(col(tsCol))
    val pt = unix_micros(col("__pt"))
    val nt = unix_micros(col("__nt"))
    grid.join(bucketed, groupCols :+ tsCol, "left")
      .withColumn("was_gap", col(outCol).isNull)
      .withColumn("__pv", last(col(outCol), ignoreNulls = true).over(back))
      .withColumn("__pt", last(knownTs, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(outCol), ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(knownTs, ignoreNulls = true).over(fwd))
      .withColumn(outCol,
        when(col("__pt").isNull, lit(null).cast("double"))
          .when(col("__nt").isNull || col("__nt") === col("__pt"),
            col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((t - pt) / (nt - pt).cast("double"))))
      .drop("__pv", "__pt", "__nv", "__nt")
  }
}
