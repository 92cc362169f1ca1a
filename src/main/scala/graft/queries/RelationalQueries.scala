package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{StableRound, Tables}
import graft.ops.Joins

/** Relational breadth (SURVEY §2.3 joins, §2.4 aggs, §2.5 windows,
  * §2.7 sorts/limits/set ops). All oracle-checked against DuckDB.
  */
object RelationalQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    // ---- joins ----------------------------------------------------------
    "join_left_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    "join_left_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // full-outer of two pre-aggregated sides: nations seen by customers
    // vs by suppliers. Pre-aggregating both sides first keeps the shuffle
    // small (aggregate-then-join beats join-then-aggregate here).
    "join_outer" -> ((s, d) => {
      val cust = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // theta/range join against a tiny literal band dim — Catalyst plans a
    // BroadcastNestedLoopJoin; the dim is 4 rows so the "nested loop" is a
    // 4-way predicate fan-out per row, cheap at any scale.
    "join_range_theta" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("b0_50", 0.0, 50.0), ("b50_100", 50.0, 100.0),
        ("b100_250", 100.0, 250.0), ("b250_1000", 250.0, 1000.0))
        .toDF("band", "lo", "hi")
      Tables.events(s, d)
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), StableRound.round6(avg("value")).as("avg_value"))
    }),

    // BANDED range self-join via bin replication — the scale rewrite for
    // an inequality-ONLY join (how many other orders are priced within
    // ±100?): with no equi key, Catalyst can only nested-loop a pure
    // range predicate (quadratic at 100 TB). Binning the band width and
    // exploding each probe row into its 3 candidate bins turns it into
    // an ordinary equi shuffle join with 3× replication of one side —
    // candidates are only same-or-adjacent-bin pairs, and the exact
    // band predicate re-filters inside the join. Arithmetic is integer
    // CENTS (2-decimal money ×100), so the band boundary is exact on
    // every engine — a double `abs(b−a) <= 100` and the oracle's
    // `BETWEEN a−100 AND a+100` can disagree at the boundary under
    // rounding, integers cannot. Left join keeps zero-neighbor orders.
    // band-neighbor COUNT, pair-free: the output is a count, so it never
    // needs the pair enumeration the naive bin-replication join does —
    // that plan's intermediate is quadratic in value DENSITY (measured
    // 82× over one 10× decade, PLANS.md §19: ~10× rows in every ±100.00
    // band ⇒ ~100× pairs). Instead build the counting relation
    // C(v) = #orders with cents ≤ v (two-level cumulative: within-bucket
    // window + tiny bucket-offset window — the exact-quantile recipe, no
    // global single-partition sort), then n_near(c) = C(c+10000) −
    // C(c−10001) − 1 via two floor lookups. The lookups reuse asOfJoin
    // on the VALUE axis (cents cast to timestamp seconds) with a
    // constant key — safe precisely because the as-of windows are
    // value-chunked, so the single key spreads across ~range/86400
    // tasks instead of serializing. Everything is linear in rows.
    "join_range_binned" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cnt = o.groupBy("cents").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val cum = graft.ops.Prefix.belowBucketed(cnt, "cents",
          sums = Seq((col("n"), "cum")), inclusive = true)
        .select(col("cents").as("v"), col("cum"))
        .withColumn("k", lit(1)).withColumn("vts", col("v").cast("timestamp"))
      val targets = o.select(col("o_orderkey"), explode(array(
          struct(lit("hi").as("side"), (col("cents") + 10000L).as("t")),
          struct(lit("lo").as("side"), (col("cents") - 10001L).as("t"))))
          .as("x"))
        .select(col("o_orderkey"), col("x.side").as("side"),
          col("x.t").cast("timestamp").as("tts"))
        .withColumn("k", lit(1))
      val looked = Joins.asOfJoin(targets, cum,
        leftKey = "k", rightKey = "k", leftTs = "tts", rightTs = "vts",
        rightTieBreak = "v", rightValueCols = Seq("cum"))
      looked.groupBy("o_orderkey").agg(
          max(when(col("side") === "hi",
            coalesce(col("asof_cum"), lit(0L)))).as("chi"),
          max(when(col("side") === "lo",
            coalesce(col("asof_cum"), lit(0L)))).as("clo"))
        .select(col("o_orderkey"),
          (col("chi") - col("clo") - 1).as("n_near"))
    }),

    // as-of join: each event enriched with the user's latest order at or
    // before the event time (one-shuffle union+last implementation).
    "join_asof" -> ((s, d) =>
      Joins.asOfJoin(
        Tables.events(s, d).select("event_id", "user_id", "ts"),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"))
        .select("event_id", "user_id", "asof_o_orderkey", "asof_o_totalprice")),

    // merge_asof direction='forward': earliest order at-or-after each
    // event (left rows with no later order keep nulls — the oracle must
    // LEFT JOIN for parity)
    "join_asof_forward" -> ((s, d) =>
      Joins.asOfJoin(
        Tables.events(s, d).select("event_id", "user_id", "ts"),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        direction = "forward")
        .select("event_id", "user_id", "asof_o_orderkey", "asof_o_totalprice")),

    // merge_asof tolerance: the backward match must lie within 8400 days
    // of the event or it nulls out (pandas tolerance=Timedelta('8400D');
    // sized to SPLIT the corpus — events are Jan-2024, per-user latest
    // orders span 1995-2001, so the bound keeps users with recent-enough
    // history and nulls the rest, making the gate non-vacuous both ways)
    "join_asof_tolerance" -> ((s, d) =>
      Joins.asOfJoin(
        Tables.events(s, d).select("event_id", "user_id", "ts"),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        toleranceMicros = Some(8400L * 86400L * 1000000L))
        .select("event_id", "user_id", "asof_o_orderkey",
          "asof_o_totalprice")),

    // merge_asof allow_exact_matches=False, demonstrated where strictness
    // is LOAD-BEARING: a self as-of joining every order to the same
    // customer's PREVIOUS order. Non-strict would match each order to
    // itself at distance 0; the strict rule excludes the same instant —
    // itself AND same-day sibling orders — so each row carries the
    // latest strictly-earlier order (first order per customer: nulls)
    "join_asof_strict" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Joins.asOfJoin(
        o.select("o_orderkey", "o_custkey", "o_orderdate"), o,
        leftKey = "o_custkey", rightKey = "o_custkey",
        leftTs = "o_orderdate", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        allowExactMatches = false)
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_o_orderkey").as("prev_orderkey"),
          col("asof_o_totalprice").as("prev_totalprice"))
    }),

    // direction × strictness × tolerance MATRIX completion (the gate's
    // distance sign flips per direction — where bugs hide). Forward +
    // strict + tolerance: each order matches the earliest strictly-LATER
    // order of the same customer, nulled when it is more than 200 days
    // out (typical same-customer gap at this SF is ~220 days, so the
    // bound splits the corpus and the gate is non-vacuous both ways)
    "join_asof_forward_tolerance" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Joins.asOfJoin(
        o.select("o_orderkey", "o_custkey", "o_orderdate"), o,
        leftKey = "o_custkey", rightKey = "o_custkey",
        leftTs = "o_orderdate", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        direction = "forward",
        allowExactMatches = false,
        toleranceMicros = Some(200L * 86400L * 1000000L))
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_o_orderkey").as("next_orderkey"),
          col("asof_o_totalprice").as("next_totalprice"))
    }),

    // nearest + strict + tolerance: BOTH direction gates are live at
    // once — the previous and next other-day order compete on absolute
    // distance, each first gated by its own (sign-flipped) bound
    "join_asof_nearest_tolerance" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Joins.asOfJoin(
        o.select("o_orderkey", "o_custkey", "o_orderdate"), o,
        leftKey = "o_custkey", rightKey = "o_custkey",
        leftTs = "o_orderdate", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        direction = "nearest",
        allowExactMatches = false,
        toleranceMicros = Some(200L * 86400L * 1000000L))
        .select(col("o_orderkey"), col("o_custkey"),
          col("asof_o_orderkey").as("near_orderkey"),
          col("asof_o_totalprice").as("near_totalprice"))
    }),

    // merge_asof direction='nearest': closest order in absolute time,
    // exact-distance ties prefer backward; distances compared at full
    // microsecond precision on both engines
    "join_asof_nearest" -> ((s, d) =>
      Joins.asOfJoin(
        Tables.events(s, d).select("event_id", "user_id", "ts"),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        direction = "nearest")
        .select("event_id", "user_id", "asof_o_orderkey", "asof_o_totalprice")),

    // ---- aggregations ---------------------------------------------------
    "agg_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(col("l_orderkey")).as("n_orders"))),

    "agg_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             count(lit(1)).as("n"))),

    // skew-resistant two-stage aggregation: events.event_type has only a
    // handful of distinct values, so a naive groupBy sends each hot key to
    // ONE reducer — at 100 TB that single task is the job. Salting splits
    // each hot key across 16 sub-keys (partial agg), then a second tiny
    // shuffle (≤ types×16 rows) recombines exactly. avg recombines as
    // Σsum/Σcount, never avg-of-avgs. Same result as the plain groupBy
    // (the oracle IS the plain groupBy).
    "agg_skew_salted" -> ((s, d) => {
      val salted = Tables.events(s, d)
        .withColumn("__salt", pmod(col("event_id"), lit(16)))
      salted.groupBy("event_type", "__salt")
        .agg(count(lit(1)).as("pc"), sum("value").as("ps"),
             max("value").as("pm"))
        .groupBy("event_type")
        .agg(sum("pc").as("n"),
             round(sum("ps"), 2).as("sum_value"),
             StableRound.round6(sum("ps") / sum("pc")).as("avg_value"),
             round(max("pm"), 6).as("max_value"))
    }),

    // skew-resistant JOIN: events.user_id has ~150 distinct values over
    // 100k+ rows — a shuffled equi-join would put each hot user on one
    // reducer. Salting: fact side gets salt = hash mod 8; dim side is
    // REPLICATED 8× (explode), join on (key, salt) spreads every hot key
    // over 8 tasks. Exact same rows as the plain join (the oracle). When
    // the dim fits the broadcast threshold Catalyst/AQE broadcasts and
    // salting is moot — this query demonstrates the pattern for dims that
    // don't.
    "join_skew_salted" -> ((s, d) => {
      val nSalt = 8
      val fact = Tables.events(s, d)
        .withColumn("__fsalt", pmod(col("event_id"), lit(nSalt)))
      val dim = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        .withColumn("__dsalt", explode(
          sequence(lit(0), lit(nSalt - 1)).cast("array<bigint>")))
      fact.join(dim,
          col("user_id") === col("c_custkey") &&
            col("__fsalt") === col("__dsalt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    }),

    // ---- window functions ----------------------------------------------
    "win_dedupe_rank" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        row_number().over(Window.partitionBy("user_id", "event_type")
          .orderBy("event_id")).as("rn"))),

    "win_topk_per_group" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")),

    "win_running_total" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        round(sum("value").over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6)
          .as("running_value"))),

    "win_lag_delta" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        round(col("value") - lag("value", 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")), 6)
          .as("delta"))),

    "win_moving_avg" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        StableRound.round6(avg("value").over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(-3, Window.currentRow))).as("mavg"))),

    // RANGE frame over a numeric ordering key: mean of all events whose
    // event_id is within 100 of the current one, per user.
    "win_moving_avg_range" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        StableRound.round6(avg("value").over(
          Window.partitionBy("user_id").orderBy("event_id")
            .rangeBetween(-100, 0))).as("range_mavg"))),

    // rolling DISCRETE p90 over a 24-row trailing window per user —
    // the percentile-latency / burst-threshold primitive. Discrete
    // (element-selection) quantile, not interpolated: the output is an
    // actual cent integer from the window, so it hash-matches any
    // engine with no float in sight. The window array is ≤24 elements
    // by construction (bounded frame ⇒ bounded per-row cost at any
    // corpus size); sort_array makes selection independent of arrival
    // order, and the 1-based index ceil(0.9·k) mirrors DuckDB list
    // indexing exactly. Same shuffle shape as every win_* entry: one
    // exchange on the partition key, in-partition sort, zero joins.
    "win_rolling_quantile" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
      val arr = sort_array(collect_list(
        round(col("value") * 100).cast("long")).over(w))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        element_at(arr, ceil(size(arr) * 0.9).cast("int"))
          .as("p90_cents"))
    }),

    // rolling z-score vs the user's own trailing baseline (24 rows,
    // EXCLUDING current — a self-inclusive baseline dilutes the very
    // anomaly it scores) — the per-entity spike detector
    // win_rolling_quantile thresholds and ts_anomaly_mad globalizes.
    // Window sums are exact cent integers (c² ≤ 1e10 · 23 rows fits
    // long comfortably); the z assembly is one straight-line double
    // expression; rows with under 12 baseline points or zero variance
    // emit null. Bounded frame ⇒ bounded per-row cost; partitioned by
    // user, so the shuffle is the same single exchange every win_*
    // entry pays.
    "win_rolling_zscore" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-23, -1)
      val c = round(col("value") * 100).cast("long")
      def D(x: org.apache.spark.sql.Column) = x.cast("double")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), c.as("c"))
        .withColumn("bn", count(lit(1)).over(w))
        .withColumn("bs", sum("c").over(w))
        .withColumn("bq", sum(col("c") * col("c")).over(w))
        .select(col("event_id"), col("user_id"),
          when(col("bn") >= 12 &&
              col("bq") * col("bn") > col("bs") * col("bs"),
            StableRound.round6(
              (D(col("c")) - D(col("bs")) / D(col("bn"))) /
                sqrt((D(col("bq")) - D(col("bs")) * D(col("bs"))
                  / D(col("bn"))) / (D(col("bn")) - 1))))
            .as("z"))
    }),

    // MAX DRAWDOWN per user on the signed cash-flow series (purchase
    // adds value, error subtracts; other event types are not flows) —
    // the peak-to-trough exposure metric, and the window-family
    // stress case where EXACTNESS is free: flows are integer cents, so
    // running sum, running max, and their gap are all exact longs —
    // no float ever enters. One hash exchange on user_id; the running
    // windows and the final per-user collapse reuse the partitioning
    // (the same one-exchange shape as agg_funnel). Ordering ties break
    // on the unique event_id, so the series is deterministic.
    "win_drawdown" -> ((s, d) => {
      val flows = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long"))
            .otherwise(-round(col("value") * 100).cast("long")).as("c"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flows
        .withColumn("cum", sum("c").over(w))
        .withColumn("runmax", max("cum").over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_flows"),
          max(col("runmax") - col("cum")).as("max_dd_cents"),
          max("cum").as("peak_cents"),
          sum("c").as("final_cents"))
    }),

    // quartile bucketing + relative rank per group — ntile ties are
    // row-order-dependent, so the ordering includes the unique key
    "win_ntile" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))).as("quartile"),
        StableRound.round6(percent_rank().over(
          Window.partitionBy("o_orderstatus")
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
          .as("pct_rank"))),

    // quantity-weighted average price per flag — Σw·x/Σw recombines
    // exactly under partial aggregation (never avg-of-avgs); one
    // map-side-combined exchange
    "agg_weighted_avg" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        StableRound.round6(
          sum(col("l_quantity") * col("l_extendedprice"))
            / sum(col("l_quantity"))).as("wavg_price"),
        round(sum("l_quantity"), 2).as("total_qty"))),

    // each order's share of its customer's total spend — the
    // ratio-to-report window (one exchange, partial-agg'd sum frame)
    "win_share_of_total" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        StableRound.round6(col("o_totalprice") /
          sum("o_totalprice").over(Window.partitionBy("o_custkey")))
          .as("share"))),

    // point-in-time join — the read side of the SCD2 tier: each event
    // is enriched with the customer-segment VERSION valid at its
    // timestamp. The version boundary (2024-01-15) splits the event
    // month, so both versions of the %2 keys are exercised, half-open
    // boundary semantics included; odd keys have one open version and
    // out-of-range user ids survive as nulls (left join).
    "join_temporal" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val boundary = lit("2024-01-15 00:00:00").cast("timestamp")
      val dim = c.select(col("c_custkey"),
          col("c_mktsegment").as("seg"),
          lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
          when(col("c_custkey") % 2 === 0, boundary)
            .otherwise(lit(null).cast("timestamp")).as("valid_to"))
        .unionByName(c.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"),
            concat(col("c_mktsegment"), lit("-v2")).as("seg"),
            boundary.as("valid_from"),
            lit(null).cast("timestamp").as("valid_to")))
      graft.ops.Joins.temporalJoin(
          Tables.events(s, d).select("event_id", "user_id", "ts"),
          dim, "user_id", "c_custkey", "ts")
        .select("event_id", "user_id", "seg", "valid_from")
    }),

    // cumulative distribution + deterministic first_value — the
    // remaining analytic-window family members (ordering includes the
    // unique key so both are tie-free across engines)
    "win_cume_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        StableRound.round6(cume_dist().over(w)).as("cdist"),
        first("o_orderkey").over(w).as("cheapest_key"))
    }),

    // full CUBE with the grouping_id bitmask — distinguishes "NULL
    // because rolled up" from a genuinely NULL group value, which the
    // rollup entry cannot
    "agg_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))),

    // TPC-H Q5-shaped STAR-SCHEMA rollup: region ⊃ nation dims gate both
    // ends of the fact (customer's nation must equal supplier's), revenue
    // per nation over one order-year. The scale shape this entry pins:
    // region/nation broadcast (5/25 rows — explicitly), customer/supplier
    // sized for Catalyst/AQE to pick broadcast at test SF and shuffle at
    // 100 TB, and the ONE unavoidable big-big exchange is lineitem⋈orders
    // on the order key with the date filter pushed into the orders scan.
    // Revenue is exact integer cents·(100−disc): sums are DECIMAL(38,0)
    // (long would overflow at ~1e18 — real-scale safe), divided once at
    // the end.
    "agg_star_schema" -> ((s, d) => {
      val rev = (round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .cast("decimal(38,0)")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          (sum(rev).cast("double") / 10000.0).as("revenue"))
    }),

    // hierarchy ROLLUP (status ⊃ priority) with the grouping_id bitmask —
    // the subtotal-report twin of agg_cube (cube = all 4 grouping sets,
    // rollup = the 3 prefix sets). Total price is summed in exact integer
    // cents (the CoreQueries agg idiom) so every subtotal row hashes
    // identically cross-engine; one shuffle, Spark expands the grouping
    // sets map-side before the exchange.
    "agg_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          (sum(round(col("o_totalprice") * 100).cast("long"))
            .cast("double") / 100.0).as("total_price"),
          grouping_id().as("gid"))),

    // frame-explicit last_value/nth_value — the default-frame trap made
    // visible: with ORDER BY, the default frame ends at CURRENT ROW, so
    // last_value degenerates to the row itself. The frame here is pinned
    // to the whole partition (UNBOUNDED..UNBOUNDED) in both engines, and
    // the ordering includes the unique key so all three are tie-free.
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        first("o_totalprice").over(w).as("cheapest_price"),
        last("o_totalprice").over(w).as("priciest_price"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
    }),

    // null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): a nullable
    // derived key (value band, with one band nullified) joined to a
    // broadcast dim that carries a NULL-keyed row — the null-safe
    // semantics route the "unknown" rows to their own bucket instead of
    // silently dropping them (what a plain equi-join would do). Broadcast
    // hash join supports <=> directly, so this stays shuffle-free on the
    // fact side.
    "join_null_safe" -> ((s, d) => {
      import s.implicits._
      val dim = Seq(
        (Option(0L), "b_low"), (Option(1L), "b_mid"),
        (Option.empty[Long], "b_unknown"),
        (Option(3L), "b_high"), (Option(4L), "b_top"))
        .toDF("band_key_d", "bucket")
      val band = floor(col("value") / 100)
      Tables.events(s, d)
        .withColumn("band_key", when(band === 2L, lit(null)).otherwise(band))
        .join(broadcast(dim), col("band_key") <=> col("band_key_d"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          StableRound.round6(avg("value")).as("avg_value"))
    }),

    // argmax/argmin (max_by/min_by): which event carried each type's
    // extreme value. `value` has 2-decimal ties, so the selector is a
    // composite key monotone in (value, event_id) — value*1e10 ≈ 5e12
    // keeps integer adds exact in a double (ulp ≪ 1), making the pick
    // tie-free and identical across engines.
    "agg_argmax" -> ((s, d) => {
      val sel = col("value") * lit(1e10) + col("event_id")
      Tables.events(s, d).groupBy("event_type").agg(
        max_by(col("event_id"), sel).as("max_event_id"),
        min_by(col("event_id"), sel).as("min_event_id"),
        round(max("value"), 2).as("max_value"))
    }),

    // HLL sketch cardinality — the estimate itself can never hash-match a
    // different engine, so the ERROR BOUND is emitted as data: the oracle
    // selects the exact twin + `true`, making the entry fully hash-checkable
    // while SketchSpec keeps the numeric bound.
    "agg_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
          approx_count_distinct(col("l_partkey")).as("approx"),
          count_distinct(col("l_partkey")).as("exact"))
        .select(col("exact").as("exact_parts"),
          (abs(col("approx") - col("exact")).cast("double") / col("exact")
            <= 0.05).as("within_5pct"))),

    // Sketch MERGEABILITY — the rollup pattern that makes sketches the
    // 100 TB cardinality path: build one Datasketches-HLL PER DAY
    // (incremental ingest materializes these once), then answer the
    // all-time question by UNIONING daily sketches — no rescan of
    // history. Check emitted as data: merged estimate within 5% of the
    // exact (single-pass) distinct count.
    "agg_hll_merge" -> ((s, d) => {
      val events = Tables.events(s, d)
      val daily = events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val merged = daily.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_est"))
      val exact = events.agg(
        count_distinct(col("user_id")).as("exact_users"))
      merged.crossJoin(exact).select(col("exact_users"),
        (abs(col("merged_est") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_5pct"))
    }),

    // Count-Min frequency sketch — bounded-memory heavy-hitter counts.
    // The sketch aggregation is distributed (mergeable buffers); only the
    // FINAL verification is driver-side, and it is bounded by the number
    // of probed keys (|event types| = 5), never by rows. CMS guarantees
    // est ≥ exact and est ≤ exact + ε·N with prob ≥ confidence.
    "agg_count_min" -> ((s, d) => {
      import s.implicits._
      val events = Tables.events(s, d)
      val eps = 0.001
      val skBin = events
        .agg(expr(s"count_min_sketch(event_type, ${eps}d, 0.99d, 42)")
          .as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBin))
      val exact = events.groupBy("event_type")
        .agg(count(lit(1)).as("exact_n")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val n = exact.map(_._2).sum
      exact.toSeq.map { case (k, ex) =>
        val est = cms.estimateCount(k)
        (k, ex, est >= ex && est <= ex + (2 * eps * n).toLong)
      }.toDF("event_type", "exact_n", "within_bound")
    }),

    // Bloom-filter pre-join — the runtime-filter pattern at scale: build
    // a bloom over the fact side's keys, broadcast it, and pre-filter the
    // other side before an expensive join (no false negatives, ≤fpp false
    // positives). Emitted check: bloom-passed count brackets the exact
    // semi-join count from above within the fpp margin.
    "agg_bloom_join" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      // df.stat.bloomFilter aggregates the sketch distributed (mergeable
      // per-partition buffers) and returns the merged filter; the probe
      // is a broadcast of the ~KB filter into a UDF — the one place a
      // UDF is warranted, since Spark exposes no public might_contain
      // column function (the engine's own InjectRuntimeFilter uses the
      // internal twin of exactly this plan shape).
      // size the filter FROM THE DATA: a fixed expectedNumItems saturates
      // once distinct keys outgrow it and the real fpp blows past the
      // asserted margin (a data-size-dependent correctness bug). The row
      // count upper-bounds the distinct count, and parquet serves it from
      // footer metadata — no extra scan.
      val nOrders = orders.count()
      val bf = orders.stat.bloomFilter("o_custkey",
        expectedNumItems = math.max(nOrders, 1000L), fpp = 0.03)
      val bfBc = s.sparkContext.broadcast(bf)
      val mightContain = udf((k: Long) => bfBc.value.mightContainLong(k))
      val maybe = cust.filter(mightContain(col("c_custkey")))
        .agg(count(lit(1)).as("bloom_n"))
      val exact = cust.join(orders, col("c_custkey") === col("o_custkey"),
          "left_semi")
        .agg(count(lit(1)).as("exact_matches"))
      val total = cust.agg(count(lit(1)).as("n_cust"))
      maybe.crossJoin(exact).crossJoin(total)
        .select(col("exact_matches"),
          (col("bloom_n") >= col("exact_matches") &&
            col("bloom_n") <= col("exact_matches") +
              ceil(col("n_cust") * 0.03).cast("long"))
            .as("within_fpp"))
    }),

    // KLL/GK-style quantile sketch — the 100 TB quantile path (exact
    // percentile buffers every value; the sketch is bounded-memory and
    // mergeable). Scalar projection (array columns crash the driver's
    // pandas row-sort), error bound emitted as data like agg_approx_distinct.
    "agg_approx_quantile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      // exact twin via the counting relation (never buffers the raw
      // column — see Stats.exactQuantilesByCounting), sketch alongside.
      // The sketch pass also carries min/max/count, and the materialized
      // one-row result feeds the quantile core's bounds relation — the
      // core's stats/targets subtrees then cost no extra corpus pass
      // (r18, same handoff as Stats.describe)
      val base = li.agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)")
          .as("apq"),
        min(col("l_extendedprice")).cast("double").as("__mn"),
        max(col("l_extendedprice")).cast("double").as("__mx"),
        count(col("l_extendedprice")).as("__n"))
        .localCheckpoint(false) // non-eager: one-row frame, no separate
                                // pre-main barrier job
      val bounds = base.select(lit("l_extendedprice").as("cn"),
        col("__mn").as("mn"), col("__mx").as("mx"), col("__n").as("n"))
      base
        .crossJoin(graft.ops.Stats.exactQuantilesByCounting(
          li, Seq("l_extendedprice"), Seq(0.5, 0.95), Some(bounds)))
        .select(
          round(col("l_extendedprice__p50"), 6).as("exact_p50"),
          round(col("l_extendedprice__p95"), 6).as("exact_p95"),
          (abs(element_at(col("apq"), 1) - col("l_extendedprice__p50")) /
            col("l_extendedprice__p50") <= 0.01).as("p50_within_1pct"),
          (abs(element_at(col("apq"), 2) - col("l_extendedprice__p95")) /
            col("l_extendedprice__p95") <= 0.01).as("p95_within_1pct"))
    }),

    // Bucketed co-located join — the 100 TB join layout story: both sides
    // are LANDED bucketed (+ sorted) on the join key via bucketBy/
    // saveAsTable, so every later join on that key is exchange-free — the
    // SortMergeJoin reads co-located buckets directly with no Exchange on
    // either side (PlanAudit.expectedNodes gates the plan). The one-time
    // bucketed write is the amortized cost; repeated joins are
    // shuffle-free. A LOCAL per-bucket SortExec remains by design:
    // Spark ≥3.1 only advertises bucket sort order under the legacy
    // outputOrdering conf, whose price is a planning-time file listing —
    // wrong at 100 TB; the local sort is shuffle-free and near-free on
    // the already-sorted runs. The pre-write repartition on the bucket
    // column uses the SAME murmur-pmod hash bucketBy does, so each
    // bucket lands as ONE file (no small-file fan-out per task).
    "join_bucketed" -> ((s, d) => {
      val key = Fixtures.key(s, s"$d/orders.parquet")
      def ensure(name: String, df0: org.apache.spark.sql.DataFrame,
          bucketCol: String): org.apache.spark.sql.DataFrame = {
        val df = df0.repartition(8, col(bucketCol))
        val tbl = s"graft_b1_${name}_$key"
        val path = s"${Fixtures.root}/graft_bucket_fixture_1f/$key/$name"
        if (!s.catalog.tableExists(tbl)) {
          if (Fixtures.exists(s, path)) {
            // layout already on disk from an earlier session: re-attach it
            // as an external bucketed table instead of rewriting — the
            // catalog entry carries the bucket spec, the files carry the
            // bucket ids in their names. This is the cluster pattern too:
            // bucketed layouts are written once and re-registered by every
            // consumer session.
            s.sql(s"""CREATE TABLE $tbl (${df.schema.toDDL})
                     |USING PARQUET
                     |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
                     |INTO 8 BUCKETS
                     |LOCATION '$path'""".stripMargin)
          } else {
            df.write.mode("overwrite")
              .bucketBy(8, bucketCol).sortBy(bucketCol)
              .option("path", path)
              .saveAsTable(tbl)
          }
        }
        s.table(tbl)
      }
      val o = ensure("orders", Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice"), "o_custkey")
      val c = ensure("customer", Tables.customer(s, d)
        .select("c_custkey", "c_nationkey"), "c_custkey")
      o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
    }),

    // Pivot (long→wide crosstab): month × order-status counts. Pivot
    // values are PINNED (never inferred — inference costs an extra
    // distinct pass and makes the output schema data-dependent, both
    // wrong at scale). Missing cells coalesce to 0 like SQL FILTER'd
    // counts.
    "agg_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("m", month(col("o_orderdate")).cast("long"))
        .groupBy("m").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("m"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))),

    // Unpivot/melt (wide→long, the pivot inverse) — e.g. reshaping metric
    // columns into (metric, value) rows for generic downstream aggs.
    // Pure Expand node: map-only, rows × |value cols|, no shuffle.
    "unpivot_melt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")),

    // Stratified sample (training-data pipelines: class-balanced
    // subsampling). sampleBy is per-row Bernoulli on a seeded hash —
    // single pass, no shuffle, exactly reproducible for a fixed seed, but
    // engine-specific — so the CHECK emitted as data is the per-stratum
    // binomial bound (observed within 5σ of n·f), and the exact stratum
    // totals carry the hash comparison.
    "sample_stratified" -> ((s, d) => {
      val fractions = Map("click" -> 0.5, "view" -> 0.1, "purchase" -> 1.0,
        "signup" -> 0.25, "error" -> 0.0)
      val events = Tables.events(s, d)
      val sampled = events.stat.sampleBy("event_type", fractions, seed = 42L)
        .groupBy("event_type").agg(count(lit(1)).as("n_sampled"))
      val totals = events.groupBy("event_type")
        .agg(count(lit(1)).as("stratum_total"))
      val f = element_at(typedlit(fractions), col("event_type"))
      totals.join(sampled, Seq("event_type"), "left")
        .select(col("event_type"), col("stratum_total"),
          (abs(coalesce(col("n_sampled"), lit(0L)).cast("double") -
            col("stratum_total") * f) <=
            lit(5.0) * sqrt(col("stratum_total") * f * (lit(1.0) - f)
              + lit(1.0))).as("sample_ok"))
    }),

    // ---- sorts / limits / top-k ----------------------------------------
    // Global top-k plans as TakeOrderedAndProject: per-partition heap of k,
    // then a k-row merge on the driver — no global sort at any scale.
    "topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "sort_orderby" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")),

    "limit_n" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy("o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // ---- set ops --------------------------------------------------------
    "set_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()),

    "set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))),

    "set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(
          Tables.supplier(s, d)
            .filter(col("s_acctbal") > 5000)
            .select(col("s_nationkey").as("nationkey")))),
  )

  def oracle: Map[String, String] = Map(
    // sketch ops: the oracle checks the exact twin + asserts the sketch's
    // published error bound held (Spark side computes the boolean)
    "agg_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  true AS within_5pct FROM lineitem""".stripMargin,

    "agg_hll_merge" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  true AS within_5pct FROM events""".stripMargin,

    "agg_count_min" ->
      """SELECT event_type, count(*) AS exact_n, true AS within_bound
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_bloom_join" ->
      """SELECT count(*) AS exact_matches, true AS within_fpp
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""
        .stripMargin,

    "win_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  CAST(round(CAST(percent_rank() OVER w AS DECIMAL(27,12)), 6)
        |    AS DOUBLE) AS pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "agg_weighted_avg" ->
      s"""SELECT l_returnflag,
        |  ${graft.StableRound.sql6(
           "sum(l_quantity * l_extendedprice) / sum(l_quantity)")}
        |    AS wavg_price,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "win_share_of_total" ->
      s"""SELECT o_orderkey, o_custkey,
        |  ${graft.StableRound.sql6(
           "o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey)")}
        |    AS share
        |FROM orders""".stripMargin,

    "join_temporal" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    TIMESTAMP '2023-01-01' AS valid_from,
        |    CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '2024-01-15'
        |    END AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '-v2',
        |    TIMESTAMP '2024-01-15', CAST(NULL AS TIMESTAMP)
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT e.event_id, e.user_id, d.seg, d.valid_from
        |FROM events e LEFT JOIN dim d
        |  ON e.user_id = d.c_custkey AND e.ts >= d.valid_from
        | AND (d.valid_to IS NULL OR e.ts < d.valid_to)""".stripMargin,

    "win_cume_dist" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(round(CAST(cume_dist() OVER w AS DECIMAL(27,12)), 6)
        |    AS DOUBLE) AS cdist,
        |  first_value(o_orderkey) OVER w AS cheapest_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_star_schema" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |    (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS DOUBLE)
        |    / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS total_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    // the oracle runs the straight inequality join (DuckDB plans its
    // IEJoin over the integer band) — same pairs as the binned rewrite
    "join_range_binned" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT a.o_orderkey, count(b.o_orderkey) AS n_near
        |FROM o a LEFT JOIN o b
        |  ON b.cents BETWEEN a.cents - 10000 AND a.cents + 10000
        | AND b.o_orderkey <> a.o_orderkey
        |GROUP BY 1""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderkey, o_orderstatus,
        |  first_value(o_totalprice) OVER w AS cheapest_price,
        |  last_value(o_totalprice) OVER w AS priciest_price,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)""".stripMargin,

    "join_null_safe" ->
      s"""WITH ev AS (
        |  SELECT value,
        |    nullif(CAST(floor(value / 100) AS BIGINT), 2) AS band_key
        |  FROM events),
        |dim(band_key_d, bucket) AS (VALUES
        |  (0, 'b_low'), (1, 'b_mid'), (NULL, 'b_unknown'),
        |  (3, 'b_high'), (4, 'b_top'))
        |SELECT bucket, count(*) AS n,
        |  ${graft.StableRound.sql6("avg(value)")} AS avg_value
        |FROM ev JOIN dim ON ev.band_key IS NOT DISTINCT FROM dim.band_key_d
        |GROUP BY bucket""".stripMargin,

    "agg_argmax" ->
      """SELECT event_type,
        |  arg_max(event_id, value * 1e10 + event_id) AS max_event_id,
        |  arg_min(event_id, value * 1e10 + event_id) AS min_event_id,
        |  round(max(value), 2) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_pivot" ->
      """SELECT month(o_orderdate) AS m,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1""".stripMargin,

    "sample_stratified" ->
      """SELECT event_type, count(*) AS stratum_total, true AS sample_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "unpivot_melt" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem""".stripMargin,

    "agg_approx_quantile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
        |  true AS p50_within_1pct, true AS p95_within_1pct
        |FROM lineitem""".stripMargin,

    "join_bucketed" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,

    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "join_outer" ->
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON c.c_nationkey = s.s_nationkey""".stripMargin,

    "join_range_theta" ->
      """SELECT band, count(*) AS n, CAST(round(CAST(avg(value) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_value
        |FROM events JOIN (VALUES
        |  ('b0_50', 0.0, 50.0), ('b50_100', 50.0, 100.0),
        |  ('b100_250', 100.0, 250.0), ('b250_1000', 250.0, 1000.0))
        |  AS b(band, lo, hi)
        |ON value >= lo AND value < hi
        |GROUP BY band""".stripMargin,

    "join_asof" ->
      """SELECT event_id, user_id,
        |  o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin,

    "join_asof_forward" ->
      """SELECT event_id, user_id,
        |  o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
        |WHERE rn = 1""".stripMargin,

    // LEFT JOIN (unlike plain join_asof's inner): out-of-tolerance
    // events must emit with nulls, not disappear
    "join_asof_tolerance" ->
      """SELECT event_id, user_id,
        |  o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   AND epoch_us(e.ts) - epoch_us(o.o_orderdate) <= 725760000000000)
        |WHERE rn = 1""".stripMargin,

    "join_asof_strict" ->
      """SELECT o_orderkey, o_custkey, prev_orderkey, prev_totalprice
        |FROM (
        |  SELECT a.o_orderkey, a.o_custkey,
        |    b.o_orderkey AS prev_orderkey,
        |    b.o_totalprice AS prev_totalprice,
        |    row_number() OVER (PARTITION BY a.o_orderkey
        |      ORDER BY b.o_orderdate DESC, b.o_orderkey DESC) AS rn
        |  FROM orders a LEFT JOIN orders b
        |    ON b.o_custkey = a.o_custkey
        |   AND b.o_orderdate < a.o_orderdate)
        |WHERE rn = 1""".stripMargin,

    // forward gate: strictly-later same-customer order within 200 days
    // (strict ⇒ same-instant rows excluded: `>` not `>=`)
    "join_asof_forward_tolerance" ->
      """SELECT o_orderkey, o_custkey, next_orderkey, next_totalprice
        |FROM (
        |  SELECT a.o_orderkey, a.o_custkey,
        |    b.o_orderkey AS next_orderkey,
        |    b.o_totalprice AS next_totalprice,
        |    row_number() OVER (PARTITION BY a.o_orderkey
        |      ORDER BY b.o_orderdate ASC, b.o_orderkey DESC) AS rn
        |  FROM orders a LEFT JOIN orders b
        |    ON b.o_custkey = a.o_custkey
        |   AND b.o_orderdate > a.o_orderdate
        |   AND epoch_us(b.o_orderdate) - epoch_us(a.o_orderdate)
        |         <= 17280000000000)
        |WHERE rn = 1""".stripMargin,

    // both direction gates live: other-instant candidates within 200
    // days either way, closest abs distance wins, exact-distance ties
    // prefer backward, then max orderkey
    "join_asof_nearest_tolerance" ->
      """SELECT o_orderkey, o_custkey, near_orderkey, near_totalprice
        |FROM (
        |  SELECT a.o_orderkey, a.o_custkey,
        |    b.o_orderkey AS near_orderkey,
        |    b.o_totalprice AS near_totalprice,
        |    row_number() OVER (PARTITION BY a.o_orderkey
        |      ORDER BY abs(epoch_us(b.o_orderdate)
        |          - epoch_us(a.o_orderdate)) ASC,
        |        CASE WHEN b.o_orderdate <= a.o_orderdate
        |          THEN 0 ELSE 1 END ASC,
        |        b.o_orderkey DESC) AS rn
        |  FROM orders a LEFT JOIN orders b
        |    ON b.o_custkey = a.o_custkey
        |   AND b.o_orderdate <> a.o_orderdate
        |   AND abs(epoch_us(b.o_orderdate) - epoch_us(a.o_orderdate))
        |         <= 17280000000000)
        |WHERE rn = 1""".stripMargin,

    // abs distance in exact microseconds; equal-distance ties prefer the
    // backward (at-or-before) candidate; then max orderkey
    "join_asof_nearest" ->
      """SELECT event_id, user_id,
        |  o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) ASC,
        |        CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END ASC,
        |        o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id)
        |WHERE rn = 1""".stripMargin,

    "agg_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "agg_skew_salted" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  CAST(round(CAST(sum(value) / count(*) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_value,
        |  round(max(value), 6) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,

    "win_dedupe_rank" ->
      """SELECT event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY event_id) AS rn
        |FROM events""".stripMargin,

    "win_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    "win_running_total" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS running_value
        |FROM events""".stripMargin,

    "win_lag_delta" ->
      """SELECT event_id, user_id,
        |  round(value - lag(value, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 6) AS delta
        |FROM events""".stripMargin,

    "win_moving_avg" ->
      """SELECT event_id, user_id,
        |  CAST(round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(27,12)), 6) AS DOUBLE) AS mavg
        |FROM events""".stripMargin,

    "win_moving_avg_range" ->
      """SELECT event_id, user_id,
        |  CAST(round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DECIMAL(27,12)), 6) AS DOUBLE) AS range_mavg
        |FROM events""".stripMargin,

    // discrete quantile = element selection on the sorted window list;
    // integer cents end-to-end, 1-based index in both engines
    "win_rolling_quantile" ->
      """WITH w AS (SELECT event_id, user_id,
        |    list_sort(list(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) AS l
        |  FROM events)
        |SELECT event_id, user_id,
        |  l[CAST(ceil(len(l) * 0.9) AS INT)] AS p90_cents
        |FROM w""".stripMargin,

    // exact integer trailing window sums; one mirrored double assembly;
    // null under 12 baseline rows or zero variance
    "win_rolling_zscore" -> {
      val z = "(CAST(c AS DOUBLE) - CAST(bs AS DOUBLE) " +
        "/ CAST(bn AS DOUBLE)) " +
        "/ sqrt((CAST(bq AS DOUBLE) - CAST(bs AS DOUBLE) " +
        "* CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE)) " +
        "/ (CAST(bn AS DOUBLE) - 1))"
      s"""WITH e AS (SELECT event_id, user_id, ts,
         |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
         |w AS (SELECT event_id, user_id, c,
         |    count(*) OVER wb AS bn, sum(c) OVER wb AS bs,
         |    sum(c * c) OVER wb AS bq
         |  FROM e WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 23 PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id,
         |  CASE WHEN bn >= 12 AND bq * bn > bs * bs
         |    THEN ${graft.StableRound.sql6(z)} END AS z
         |FROM w""".stripMargin
    },

    // integer-cents running sum / running max / gap — every column
    // exact, no rounding bridge needed
    "win_drawdown" ->
      """WITH f AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT)
        |      ELSE -CAST(round(value * 100) AS BIGINT) END AS c
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |cu AS (SELECT user_id, ts, event_id, c,
        |    sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM f),
        |w AS (SELECT user_id, c, cum,
        |    max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM cu)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_flows,
        |  CAST(max(runmax - cum) AS BIGINT) AS max_dd_cents,
        |  CAST(max(cum) AS BIGINT) AS peak_cents,
        |  CAST(sum(c) AS BIGINT) AS final_cents
        |FROM w GROUP BY 1""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "sort_orderby" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "limit_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50""".stripMargin,

    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier
        |WHERE s_acctbal > 5000""".stripMargin,
  )
}
