package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{StableRound, Tables}
import graft.ops.{Dedupe, TimeSeries}

/** Core scan/filter/agg/join/dedupe queries — the reference's behavioral
  * heart (dedupe + resample, `datapump.py:446-456`, `:287-327`) plus the
  * first relational-breadth entries (SURVEY §2.1, §2.2, §2.4, §2.6).
  */
object CoreQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    // §2.1 scan_parquet — plain columnar scan; Catalyst prunes to the three
    // selected columns (check ReadSchema in explain).
    "scan_parquet" -> ((s, d) =>
      Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")),

    // §2.2 filter_predicate — TPC-H Q6-shaped predicate; all four conjuncts
    // are pushed to the parquet reader (PushedFilters).
    "filter_predicate" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
                (col("l_extendedprice") * col("l_discount")).as("revenue"))),

    // §2.4 agg_groupby_basic — TPC-H Q1-shaped group-aggregate; partial
    // aggregation (map-side combine) then one shuffle on the 6-group key.
    "agg_groupby_basic" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          StableRound.round6(avg("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // §2.4 batch sessionization — the gaps-and-islands twin of the
    // streaming session window (30-min gap per user), one hash shuffle
    "agg_sessionize" -> ((s, d) =>
      graft.ops.TimeSeries.sessionize(Tables.events(s, d), "user_id",
        "ts", gapMinutes = 30)),

    // §2.4 agg_resample_mean — the reference's frequency stat
    // (H resample grouped by a key, datapump.py:294) over events.
    "agg_resample_mean" -> ((s, d) =>
      TimeSeries.resampleAgg(Tables.events(s, d), "ts", "H",
          Seq("event_type"),
          Seq(StableRound.round6(avg("value")).as("avg_value"),
              count(lit(1)).as("n")))
        .withColumnRenamed("ts", "bucket_start")),

    // §2.4 calendar-frequency resample (date_trunc path) over the 80-month
    // orders history — start-labeled months (documented pandas deviation).
    // The mean is computed in EXACT integer math (cents -> floor'd
    // micro-units): o_totalprice is an exact 2-decimal value with ~3e5
    // magnitude, where a double avg's cross-engine ULP noise (~6e-11)
    // straddles terminating-rational round boundaries — observed as a
    // 1-digit oracle mismatch at sf0.01 before this change. The cent-sum
    // accumulates in DECIMAL(38,0), not BIGINT: a group's scaled cent-sum
    // passes 2^63 at large TPC-H scale factors and would silently wrap in
    // non-ANSI mode (DuckDB's BIGINT sum widens to HUGEINT, so only the
    // Spark side needed widening).
    "agg_resample_calendar" -> ((s, d) =>
      TimeSeries.resampleAgg(Tables.orders(s, d), "o_orderdate", "M",
          Seq("o_orderstatus"),
          Seq((expr("(sum(cast(round(o_totalprice * 100) as decimal(38,0)))" +
                " * 10000) div count(1)").cast("double") / 1000000.0)
                .as("avg_price"),
              count(lit(1)).as("n")))
        .withColumnRenamed("o_orderdate", "month_start")),

    // §2.4 dense-grid resample + FORWARD FILL — pandas
    // resample('H').mean().ffill(): every hourly bucket on the per-group
    // grid is emitted, gaps carry the last real mean, was_gap marks them.
    // Closes the documented "empty buckets not emitted" deviation of
    // agg_resample_mean; everything past the bucket agg is grid-sized.
    "agg_resample_ffill" -> ((s, d) =>
      TimeSeries.resampleFfill(Tables.events(s, d), "ts", "H",
          Seq("event_type"), StableRound.round6(avg("value")), "value")
        .withColumnRenamed("ts", "bucket_start")),

    // pandas interpolate() parity on the resample grid: interior gaps
    // linear between surrounding known buckets, trailing gaps hold,
    // leading gaps stay null (see TimeSeries.resampleInterp for why the
    // arithmetic is engine-exact). 15-minute buckets, not hourly: the
    // hourly grid has zero gaps at sf0.1, and a fill op whose fill path
    // never runs proves nothing — 15T leaves real gaps at every SF.
    "agg_resample_interp" -> ((s, d) =>
      TimeSeries.resampleInterp(Tables.events(s, d), "ts", "15T",
          Seq("event_type"), StableRound.round6(avg("value")), "value")
        .withColumnRenamed("ts", "bucket_start")),

    // OHLC downsampling (pandas resample().ohlc()): open/close are the
    // bucket's first/last value by event time — picked via max_by/min_by
    // over a (ts, event_id) STRUCT ordering key, tie-free for any time
    // span (a packed scalar `micros·1e6 + id` overflows Long silently
    // once the span passes ~106 days; struct comparison has no overflow
    // to have). The oracle mirrors with DuckDB's ordered first/last
    // aggregate. One map-side-combined aggregation; at 100 TB this is
    // the same cost class as agg_resample_mean.
    "agg_resample_ohlc" -> ((s, d) => {
      val key = struct(col("ts"), col("event_id"))
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("bucket_start"))
        .agg(
          min_by(col("value"), key).as("open"),
          round(max("value"), 2).as("high"),
          round(min("value"), 2).as("low"),
          max_by(col("value"), key).as("close"))
    }),

    // cohort retention matrix — the user-lifecycle report: users
    // grouped by first-seen DAY (cohort; day-granular because this
    // corpus is one month — week cohorts degenerate to a single row),
    // counted distinct per weeks-since-cohort offset. Two aggregations,
    // both on user_id partitioning: the first-seen min reuses the same
    // hash exchange the distinct-count needs — no extra shuffle for the
    // cohort tag.
    "agg_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          expr("datediff(day, cohort_day) div 7").as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_active"))
    }),

    // daily growth report: events / active users / NEW users / running
    // cumulative uniques per day — the dashboard quartet. n_new comes
    // from the first-seen projection (one groupBy(user) min), so the
    // cumulative-distinct curve needs no distinct-over-window (which
    // would buffer user sets); the final running sum orders a
    // #days-sized frame — the single-partition window is a 30-row
    // driver-side triviality here and stays bounded by calendar length,
    // not data, at any scale.
    "agg_user_growth" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val daily = ev.groupBy("day").agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_active"))
      val news = ev.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      val grid = daily.join(news, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("__dn", datediff(col("day"), lit("1970-01-01")))
        // belowBucketed scans its dom 3× (documented contract) and each
        // evaluation re-ran BOTH corpus aggregations — the grid is one
        // row per DAY, the textbook bounded frame (r17 opt: 8 source
        // scans → 2 in the plan)
        .localCheckpoint()
      graft.ops.Prefix.belowBucketed(grid, "__dn",
          sums = Seq((col("n_new"), "cum_users")), inclusive = true)
        .drop("__dn")
    }),

    // gaps-and-islands: per-user consecutive-day activity streaks. The
    // classic rewrite — day minus row_number() is CONSTANT within a
    // consecutive run — turns streak detection into a group-by, no
    // self-join, no recursive anything. Cost at 100 TB: one distinct on
    // (user, day) (map-side combined — the raw event fan-in collapses
    // before the exchange), one window sort per user, and the two
    // roll-ups ride the user_id partitioning. All-integer output.
    "win_gaps_islands" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val streaks = days
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
      streaks.groupBy("user_id").agg(
        sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"))
    }),

    // truncated EWMA (α = 1/2, 8 taps) per user over arrival order — the
    // trend-smoothing primitive. Dyadic α makes every weight 2^-k EXACT:
    // numerator and denominator are integer sums in cents·2^7, the only
    // float ops are the final two divisions (single IEEE ops on the same
    // operands in any engine ⇒ bit-identical). All 8 lags share ONE
    // window spec ⇒ one exchange + one sort, k columns wide, same cost
    // class as win_lag_delta regardless of tap count.
    "agg_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .withColumn("c", round(col("value") * 100).cast("long"))
      val terms = (0 to 7).map { k =>
        val lk = if (k == 0) col("c") else lag(col("c"), k).over(w)
        (when(lk.isNotNull, lk * (1L << (7 - k))).otherwise(0L),
          when(lk.isNotNull, lit(1L << (7 - k))).otherwise(0L))
      }
      val num = terms.map(_._1).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      ev.select(col("user_id"), col("event_id"),
        StableRound.round6(
          num.cast("double") / den.cast("double") / 100.0).as("ewma"))
    }),

    // §2.4 ordered event-funnel (view → click-after-view →
    // purchase-after-that-click), per user. The stage gates are ORDERED
    // mins — stage k's first instant must be ≥ stage k-1's — computed as
    // a chain of whole-partition window mins over ONE hash exchange on
    // user_id (no ordering ⇒ no sort; the three window operators and the
    // final per-user collapse all reuse the same partitioning). depth is
    // the funnel progress (0–3). At 100 TB this is the cost class of one
    // groupBy(user) — no joins, no driver loop.
    "agg_funnel" -> ((s, d) =>
      TimeSeries.funnel(Tables.events(s, d), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))),

    // §2.6 dedupe_keep_last / dedupe_keep_first — order-sensitive PK dedupe;
    // event_id is the arrival order (file order proxy in the test corpus).
    "dedupe_keep_last" -> ((s, d) =>
      Dedupe.keepLast(Tables.events(s, d), Seq("user_id", "event_type"),
          col("event_id"))
        .select("event_id", "user_id", "event_type", "value")),

    "dedupe_keep_first" -> ((s, d) =>
      Dedupe.keepFirst(Tables.events(s, d), Seq("user_id", "event_type"),
          col("event_id"))
        .select("event_id", "user_id", "event_type", "value")),

    // §2.4 agg_dupe_count — the reference's logged dupe metric.
    "agg_dupe_count" -> ((s, d) =>
      Dedupe.dupeCountDf(Tables.events(s, d), Seq("user_id", "event_type"))),

    // §2.3 join_broadcast — small-dim broadcast join (region is 5 rows).
    "join_broadcast" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")),

    // §2.3 join_inner_equi — fact ⋈ dim with aggregation on top; customer is
    // broadcastable at test SF but shuffle-joins correctly at scale.
    "join_inner_equi" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue"))),
  )

  def oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",

    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "agg_groupby_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  CAST(round(CAST(avg(l_discount) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "agg_resample_calendar" ->
      """SELECT o_orderstatus,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST((CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    * 10000) // count(*) AS BIGINT) / 1000000.0 AS avg_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus, month_start""".stripMargin,

    "agg_resample_mean" ->
      """SELECT event_type,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |  CAST(round(CAST(avg(value) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_value, count(*) AS n
        |FROM events GROUP BY event_type, bucket_start""".stripMargin,

    // dense grid via generate_series; fill = last_value IGNORE NULLS over
    // the same running frame as the Spark `last(_, ignoreNulls)` window
    "agg_resample_ffill" ->
      """WITH b AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |    CAST(round(CAST(avg(value) AS DECIMAL(27,12)), 6) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL 1 HOUR)) AS bucket_start
        |  FROM b GROUP BY event_type)
        |SELECT g.event_type, g.bucket_start,
        |  last_value(b.v IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.bucket_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  (b.v IS NULL) AS was_gap
        |FROM g LEFT JOIN b
        |  ON g.event_type = b.event_type AND g.bucket_start = b.bucket_start""".stripMargin,

    // same integer composite key picks open/close; arg_min/arg_max are
    // DuckDB's min_by/max_by
    "agg_resample_ohlc" ->
      """SELECT event_type,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
        |  first(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS open,
        |  round(max(value), 2) AS high,
        |  round(min(value), 2) AS low,
        |  last(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS close
        |FROM events GROUP BY 1, 2""".stripMargin,

    "agg_retention" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "agg_user_growth" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |daily AS (SELECT day, count(*) AS n_events,
        |    count(DISTINCT user_id) AS n_active FROM ev GROUP BY 1),
        |fs AS (SELECT user_id, min(day) AS day FROM ev GROUP BY 1),
        |news AS (SELECT day, count(*) AS n_new FROM fs GROUP BY 1)
        |SELECT daily.day, n_events, n_active,
        |  coalesce(n_new, 0) AS n_new,
        |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY daily.day)
        |    AS BIGINT) AS cum_users
        |FROM daily LEFT JOIN news ON daily.day = news.day""".stripMargin,

    "win_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |i AS (SELECT user_id, day - CAST(row_number() OVER (
        |    PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        |  FROM days),
        |s AS (SELECT user_id, anchor, count(*) AS len
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, max(len) AS longest_streak
        |FROM s GROUP BY 1""".stripMargin,

    // numerator/denominator mirror the Spark lag chain term-for-term;
    // the two divisions are the only float ops (deterministic IEEE)
    "agg_ewma" ->
      """WITH b AS (SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |l AS (SELECT user_id, event_id, c AS c0,
        |    lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
        |    lag(c, 3) OVER w AS c3, lag(c, 4) OVER w AS c4,
        |    lag(c, 5) OVER w AS c5, lag(c, 6) OVER w AS c6,
        |    lag(c, 7) OVER w AS c7
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id,
        |  CAST(round(CAST(
        |    CAST(c0*128 + coalesce(c1*64, 0) + coalesce(c2*32, 0)
        |      + coalesce(c3*16, 0) + coalesce(c4*8, 0)
        |      + coalesce(c5*4, 0) + coalesce(c6*2, 0)
        |      + coalesce(c7, 0) AS DOUBLE)
        |    / CAST(128 + (CASE WHEN c1 IS NULL THEN 0 ELSE 64 END)
        |      + (CASE WHEN c2 IS NULL THEN 0 ELSE 32 END)
        |      + (CASE WHEN c3 IS NULL THEN 0 ELSE 16 END)
        |      + (CASE WHEN c4 IS NULL THEN 0 ELSE 8 END)
        |      + (CASE WHEN c5 IS NULL THEN 0 ELSE 4 END)
        |      + (CASE WHEN c6 IS NULL THEN 0 ELSE 2 END)
        |      + (CASE WHEN c7 IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    / 100.0 AS DECIMAL(27,12)), 6) AS DOUBLE) AS ewma
        |FROM l""".stripMargin,

    // same grid construction as the ffill oracle (time_bucket's 15-min
    // boundaries coincide with Spark window()'s epoch alignment — both
    // origins are whole hours) + backward/forward known-value windows;
    // the CASE mirrors TimeSeries.resampleInterp exactly
    "agg_resample_interp" ->
      """WITH b AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |      AS bucket_start,
        |    CAST(round(CAST(avg(value) AS DECIMAL(27,12)), 6) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      INTERVAL 15 MINUTE)) AS bucket_start
        |  FROM b GROUP BY event_type),
        |j AS (
        |  SELECT g.event_type, g.bucket_start, b.v, (b.v IS NULL) AS was_gap
        |  FROM g LEFT JOIN b
        |    ON g.event_type = b.event_type AND g.bucket_start = b.bucket_start),
        |f AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER back AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket_start END
        |      IGNORE NULLS) OVER back AS pt,
        |    first_value(v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket_start END
        |      IGNORE NULLS) OVER fwd AS nt
        |  FROM j
        |  WINDOW back AS (PARTITION BY event_type ORDER BY bucket_start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY event_type ORDER BY bucket_start
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, bucket_start,
        |  CASE WHEN pt IS NULL THEN NULL
        |       WHEN nt IS NULL OR nt = pt THEN pv
        |       ELSE pv + (nv - pv) *
        |         ((epoch_us(bucket_start) - epoch_us(pt))
        |          / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
        |  END AS value,
        |  was_gap
        |FROM f""".stripMargin,

    // gaps-and-islands with the same ≥-gap break rule as the Spark window
    "agg_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // same ordered-min chain via grouped conditional aggregation
    "agg_funnel" ->
      """WITH u1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        |  FROM events GROUP BY user_id),
        |u2 AS (
        |  SELECT e.user_id, u1.first_view,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts >= u1.first_view
        |        THEN e.ts END) AS first_click
        |  FROM events e JOIN u1 USING (user_id)
        |  GROUP BY e.user_id, u1.first_view),
        |u3 AS (
        |  SELECT e.user_id, u2.first_view, u2.first_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts >= u2.first_click
        |        THEN e.ts END) AS first_purchase
        |  FROM events e JOIN u2 USING (user_id)
        |  GROUP BY e.user_id, u2.first_view, u2.first_click)
        |SELECT user_id,
        |  CAST(first_view AS TIMESTAMP) AS first_view,
        |  CAST(first_click AS TIMESTAMP) AS first_click,
        |  CAST(first_purchase AS TIMESTAMP) AS first_purchase,
        |  CASE WHEN first_purchase IS NOT NULL THEN 3
        |       WHEN first_click IS NOT NULL THEN 2
        |       WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS depth
        |FROM u3""".stripMargin,

    "dedupe_keep_last" ->
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "dedupe_keep_first" ->
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY event_id ASC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "agg_dupe_count" ->
      """SELECT count(*) - count(DISTINCT (user_id, event_type)) AS dupe_count
        |FROM events""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "join_inner_equi" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
  )
}
