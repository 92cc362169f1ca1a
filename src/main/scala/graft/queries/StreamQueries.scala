package graft.queries

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import graft.{StableRound, Tables}
import graft.streaming.StreamOps

/** Driver-checkable Structured Streaming queries (SURVEY §2.9): each runs
  * a REAL streaming query (file source → AvailableNow → memory sink) to
  * completion and returns the materialized table, so the DuckDB oracle
  * verifies batch/stream parity: same input ⇒ same result as batch SQL.
  *
  * Windowed aggregations run in complete mode (deterministic full output);
  * watermark/late-data semantics — which have no batch-SQL equivalent —
  * are covered by StreamingSpec instead.
  */
object StreamQueries extends QueryPack {

  // events.ts has shipped as INT64 nanos (long) and as TIMESTAMP_NTZ micros
  // across testdata generations; normalize exactly like Tables.events.
  private def eventsStream(s: org.apache.spark.sql.SparkSession, d: String,
      glob: Option[String] = None) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = s.read.parquet(s"$d/events.parquet") // schema template
    // glob, not literal path: single-file paths fail basePath validation
    val raw = StreamOps.fileStreamParquet(s,
      glob.getOrElse(s"$d/events.parque*"), batch.schema)
    batch.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // sessions pin spark.sql.session.timeZone=UTC → value-preserving
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def queries: Map[String, Q] = Map(
    "stream_window_tumbling" -> ((s, d) =>
      StreamOps.runToMemory(
        StreamOps.tumbling(eventsStream(s, d), "ts", "1 hour",
          Seq("event_type"),
          Seq(count(lit(1)).as("n"), StableRound.round6(avg("value")).as("avg_value"))),
        outputMode = "complete")
        .select(col("event_type"), col("window.start").as("bucket_start"),
          col("n"), col("avg_value"))),

    "stream_window_sliding" -> ((s, d) =>
      StreamOps.runToMemory(
        StreamOps.sliding(eventsStream(s, d), "ts", "2 hours", "1 hour",
          Seq("event_type"), Seq(count(lit(1)).as("n"))),
        outputMode = "complete")
        .select(col("event_type"), col("window.start").as("win_start"),
          col("n"))),

    // streaming robust-QA report: per (event_type, hour) median/MAD +
    // anomaly count — the streaming face of ts_anomaly_mad (there a
    // per-row rolling gate, here the per-window monitoring rollup a
    // live pipeline dashboards). The windowed agg carries ONLY the
    // sorted cents array through the state store; lower-median, MAD,
    // and the 10⁴·|x−med| > 44478·MAD count are batch projections on
    // the materialized table — all integer ops, so stream/batch parity
    // is exact (same integer gate as Stats.rollingMadOutliers).
    "stream_anomaly_mad" -> ((s, d) => {
      val src = eventsStream(s, d)
        .withColumn("c", round(col("value") * 100).cast("long"))
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(src, "ts", "1 hour", Seq("event_type"),
          Seq(sort_array(collect_list(col("c"))).as("arr"))),
        outputMode = "complete")
      agged
        .withColumn("n", size(col("arr")).cast("long"))
        .withColumn("med",
          element_at(col("arr"), expr("cast((size(arr) + 1) div 2 as int)")))
        .withColumn("mad", element_at(
          sort_array(transform(col("arr"), x => abs(x - col("med")))),
          expr("cast((size(arr) + 1) div 2 as int)")))
        .select(col("event_type"), col("window.start").as("bucket_start"),
          col("n"), col("med").as("med_cents"), col("mad").as("mad_cents"),
          size(filter(col("arr"),
            x => abs(x - col("med")) * 10000L > col("mad") * 44478L))
            .cast("long").as("n_anomalies"))
    }),

    // streaming KL(day ‖ baseline) — agg_kl_drift's live face and
    // stream_psi_drift's information-theoretic sibling; identical
    // bounded-state shape (one count per (day, type, bin) key), only
    // the batch-projected weight/normalizer change
    "stream_kl_drift" -> ((s, d) => {
      val B = 10
      def bin(c: org.apache.spark.sql.Column) =
        least(expr(s"cast(floor(${c} * 100 + 0.5) as bigint) div 5000"),
          lit(9L))
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(
          eventsStream(s, d).withColumn("bin", bin(col("value"))),
          "ts", "1 day", Seq("event_type", "bin"),
          Seq(count(lit(1)).as("c"))),
        outputMode = "complete")
        .select(col("event_type"), col("window.start").as("day_start"),
          col("bin"), col("c"))
      val ref = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .withColumn("bin", bin(col("value")))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("cr"))
      val refTot = ref.groupBy("event_type").agg(sum("cr").as("nr"))
      val dayTot = agged
        .select(col("event_type").as("et"), col("day_start").as("ds"),
          col("c"))
        .groupBy("et", "ds").agg(sum("c").as("nd"))
        .select(col("et").as("event_type"), col("ds").as("day_start"),
          col("nd"))
      def l6(c: org.apache.spark.sql.Column) =
        floor(graft.StableRound.round6(log(c.cast("double"))) * 1e6 + 0.5)
          .cast("long")
      dayTot.select(col("event_type"), col("day_start"), col("nd"),
          explode(sequence(lit(0L), lit(9L))).as("bin"))
        .join(agged, Seq("event_type", "day_start", "bin"), "left")
        .na.fill(0L, Seq("c"))
        .join(broadcast(refTot), "event_type")
        .join(broadcast(ref), Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("cr"))
        .withColumn("t6", l6(col("c") + 1) - l6(col("nd") + B)
          - l6(col("cr") + 1) + l6(col("nr") + B))
        .groupBy("event_type", "day_start")
        .agg(max("nd").as("n_day"), max("nr").as("n_ref"),
          sum((col("c") + 1) * col("t6")).as("ssum6"))
        .select(col("event_type"), col("day_start"), col("n_day"),
          col("n_ref"),
          graft.StableRound.round6(col("ssum6").cast("double") / 1e6
            / (col("n_day") + B).cast("double")).as("kl"))
    }),

    // streaming Tukey gate: per-day count of events outside the
    // month-first-half 1.5·IQR fences per type — agg_outlier_iqr's live
    // face. The fences are a broadcast BATCH aggregate (per-type
    // integers at 2× cent scale, computed with agg_outlier_iqr's
    // ceil-division discrete quartiles); the stream carries only a
    // precomputed boolean, so state = TWO counts per (day window, type)
    // key. Fully integer output.
    "stream_outlier_iqr" -> ((s, d) => {
      val dom = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("c")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val fences = dom
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(wt))
        .groupBy("event_type")
        .agg(min(when(col("cum") >= expr("(n + 3) div 4"), col("c")))
            .as("q1"),
          min(when(col("cum") >= expr("(n * 3 + 3) div 4"), col("c")))
            .as("q3"))
        .select(col("event_type"),
          (col("q1") * 2 - (col("q3") - col("q1")) * 3).as("lo2"),
          (col("q3") * 2 + (col("q3") - col("q1")) * 3).as("hi2"))
      val flagged = eventsStream(s, d)
        .withColumn("c", round(col("value") * 100).cast("long"))
        .join(broadcast(fences), Seq("event_type"))
        .withColumn("out",
          when(col("c") * 2 < col("lo2") || col("c") * 2 > col("hi2"), 1L)
            .otherwise(0L))
      StreamOps.runToMemory(
        StreamOps.tumbling(flagged, "ts", "1 day", Seq("event_type"),
          Seq(count(lit(1)).as("n_day"), sum("out").as("n_outliers"))),
        outputMode = "complete")
        .select(col("window.start").as("day_start"), col("event_type"),
          col("n_day"), col("n_outliers"))
    }),

    // streaming face of agg_benford: per-day first-digit counts of the
    // value column — the live fabricated-data / unit-mixup screen. The
    // windowed agg keys on (day window, digit) and carries ONE count per
    // key (≤9 rows/day — bounded state by construction); the leading
    // digit comes from the exact cent integer's decimal rendering
    // (agg_benford's no-float-log10 recipe), computed BEFORE the
    // streaming agg so the state key is a tiny int. Shares are batch
    // projections on the materialized table.
    "stream_benford" -> ((s, d) => {
      val digit = substring(
        round(col("value") * 100).cast("long").cast("string"), 1, 1)
        .cast("int")
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(
          eventsStream(s, d).withColumn("digit", digit),
          "ts", "1 day", Seq("digit"),
          Seq(count(lit(1)).as("n_d"))),
        outputMode = "complete")
        .select(col("window.start").as("day_start"), col("digit"),
          col("n_d"))
      // fresh exprIds on the rollup key (the psi-drift dayTot pattern)
      val dayTot = agged.select(col("day_start").as("ds"), col("n_d"))
        .groupBy("ds").agg(sum("n_d").as("n"))
      agged.join(dayTot, agged("day_start") === dayTot("ds"))
        .select(col("day_start"), col("digit"), col("n_d"),
          graft.StableRound.round6(col("n_d").cast("double")
            / col("n").cast("double")).as("share"))
    }),

    // streaming face of agg_shannon_diversity: per-day event-type-mix
    // entropy, live. State = ONE count per (day window, type) key —
    // bounded by |types| per day; entropy assembly (per-term −p·ln p on
    // the round6 grid, 1e6 fixed-point longs) is a batch projection on
    // the materialized table, identical to the batch recipe.
    "stream_shannon_diversity" -> ((s, d) => {
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(
          eventsStream(s, d),
          "ts", "1 day", Seq("event_type"),
          Seq(count(lit(1)).as("n"))),
        outputMode = "complete")
        .select(col("window.start").as("day_start"), col("event_type"),
          col("n"))
      val tot = agged.select(col("day_start").as("ds"), col("n"))
        .groupBy("ds").agg(sum("n").as("nd"), count(lit(1)).as("k"))
      val p = col("n").cast("double") / col("nd").cast("double")
      val t6 = floor(graft.StableRound.round6(-p * log(p)) * 1e6 + 0.5)
        .cast("long")
      agged.join(tot, agged("day_start") === tot("ds"))
        .select(col("day_start"), col("nd"), col("k"), t6.as("t6"))
        .groupBy("day_start")
        .agg(max("nd").as("n_day"), max("k").as("n_types"),
          sum("t6").as("h6"))
        .select(col("day_start"), col("n_day"), col("n_types"),
          graft.StableRound.round6(col("h6").cast("double") / 1e6)
            .as("entropy"),
          when(col("n_types") > 1, graft.StableRound.round6(
            col("h6").cast("double") / 1e6
              / log(col("n_types").cast("double"))))
            .otherwise(lit(0.0)).as("norm_entropy"))
    }),

    // streaming DRIFT MONITOR: per-day PSI of each event_type's value
    // distribution vs the month-first-half baseline — agg_psi_drift's
    // live face. The streaming state is genuinely bounded: the windowed
    // agg keys on (day window, event_type, bin) and carries ONE count
    // per key (≤ types·bins rows per day), never values or arrays. The
    // baseline is a broadcast batch aggregate (types·bins rows); grid
    // densification and the integer PSI recipe (see agg_psi_drift) are
    // batch projections on the materialized table.
    "stream_psi_drift" -> ((s, d) => {
      val B = 10
      def bin(c: org.apache.spark.sql.Column) =
        least(expr(s"cast(floor(${c} * 100 + 0.5) as bigint) div 5000"),
          lit(9L))
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(
          eventsStream(s, d).withColumn("bin", bin(col("value"))),
          "ts", "1 day", Seq("event_type", "bin"),
          Seq(count(lit(1)).as("c"))),
        outputMode = "complete")
        .select(col("event_type"), col("window.start").as("day_start"),
          col("bin"), col("c"))
      val ref = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .withColumn("bin", bin(col("value")))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("cr"))
      val refTot = ref.groupBy("event_type").agg(sum("cr").as("nr"))
      // fresh exprIds on the rollup keys: dayTot joins back onto agged
      // below, and same-id self-join references fail analysis otherwise
      val dayTot = agged
        .select(col("event_type").as("et"), col("day_start").as("ds"),
          col("c"))
        .groupBy("et", "ds").agg(sum("c").as("nd"))
        .select(col("et").as("event_type"), col("ds").as("day_start"),
          col("nd"))
      def l6(c: org.apache.spark.sql.Column) =
        floor(graft.StableRound.round6(log(c.cast("double"))) * 1e6 + 0.5)
          .cast("long")
      dayTot.select(col("event_type"), col("day_start"), col("nd"),
          explode(sequence(lit(0L), lit(9L))).as("bin"))
        .join(agged, Seq("event_type", "day_start", "bin"), "left")
        .na.fill(0L, Seq("c"))
        .join(broadcast(refTot), "event_type")
        .join(broadcast(ref), Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("cr"))
        .withColumn("w", (col("c") + 1) * (col("nr") + B)
          - (col("cr") + 1) * (col("nd") + B))
        .withColumn("t6", l6(col("c") + 1) - l6(col("nd") + B)
          - l6(col("cr") + 1) + l6(col("nr") + B))
        .groupBy("event_type", "day_start")
        .agg(max("nd").as("n_day"), max("nr").as("n_ref"),
          sum(col("w") * col("t6")).as("ssum6"))
        .select(col("event_type"), col("day_start"), col("n_day"),
          col("n_ref"),
          graft.StableRound.round6(col("ssum6").cast("double") / 1e6
            / ((col("n_day") + B) * (col("n_ref") + B)).cast("double"))
            .as("psi"))
    }),

    // streaming leaderboard: top-3 events by value per (event_type, hour)
    // with k-BOUNDED state (StreamOps.statefulTopK — the state store
    // holds ≤ 3 pairs per key, independent of window row count). Append
    // mode re-emits the current leaderboard each batch a key appears in;
    // the rank-r entry is monotone non-decreasing under
    // struct(cents, -event_id) as the multiset grows, so max-per-rank
    // collapses multi-batch replays to the final leaderboard exactly.
    "stream_topk" -> ((s, d) =>
      StreamOps.runToMemory(
        StreamOps.statefulTopK(eventsStream(s, d), k = 3),
        outputMode = "append")
        .groupBy("event_type", "bucket_start", "rk")
        .agg(max(struct(col("value_cents"), (-col("event_id")).as("negid")))
          .as("m"))
        .select(col("event_type"), col("bucket_start"), col("rk"),
          col("m.value_cents").as("value_cents"),
          (-col("m.negid")).as("event_id"))),

    "stream_window_session" -> ((s, d) =>
      StreamOps.runToMemory(
        StreamOps.session(eventsStream(s, d), "ts", "30 minutes",
          Seq("user_id"), Seq(count(lit(1)).as("n"), min("ts").as("first_ts"))),
        outputMode = "complete")
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("first_ts"), col("n"))),

    // streaming SESSIONIZE — the streaming face of agg_sessionize:
    // watermarked session_window in APPEND mode, so each session is
    // emitted exactly once when the watermark passes its close (the
    // production shape: bounded state, finalized sessions flow to the
    // sink). session_window's merge rule (join while gap < 30 min) is
    // the same ≥-gap break as the batch gaps-and-islands window, and
    // session_end is max(ts) (not window.end = last+gap), so one
    // AvailableNow pass over the full corpus reproduces the batch
    // result exactly. Watermark epochs are driven by TWO sequential
    // checkpointed runs (the stream_late_data pattern): run 1 drains
    // the real events (single batch — nothing can be late); run 2
    // ships one far-future sentinel row that pushes the watermark past
    // every real session's close, flushing the append-mode tail. The
    // sentinel's own (still-open) session is keyed user_id = -1 and
    // filtered from the result.
    "stream_sessionize" -> ((s, d) => {
      import scala.jdk.CollectionConverters._
      val base = Fixtures.freshDir("graft_sessionize_fixture")
      // fresh fixture+checkpoint every call: a remembered checkpoint
      // would replay nothing and emit an empty increment
      val src = base.resolve("src"); Files.createDirectories(src)
      val out = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      Files.copy(Paths.get(s"$d/events.parquet"),
        src.resolve("events.parquet"))
      def runOnce(): Unit = {
        val q = StreamOps.withStatePartitions(s, 8) {
          eventsStream(s, d, Some(s"$src/*.parquet"))
            .withWatermark("ts", "10 minutes")
            .groupBy(col("user_id"),
              session_window(col("ts"), "30 minutes"))
            .agg(min("ts").as("session_start"),
              max("ts").as("session_end"),
              count(lit(1)).as("n_events"))
            .select(col("user_id"), col("session_start"),
              col("session_end"), col("n_events"))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        q.awaitTermination()
      }
      runOnce()
      // sentinel in the SOURCE's physical encoding (ts has shipped as
      // INT64 nanos and as TIMESTAMP_NTZ micros across testdata
      // generations) — the pinned stream schema must read both files
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$d/events.parquet")
      val farTs: org.apache.spark.sql.Column =
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            lit(4102444800000000000L) // 2100-01-01 in ns
          case dt => lit("2100-01-01 00:00:00").cast(dt)
        }
      val sentinel = raw.limit(1)
        .withColumn("event_id", lit(-1L))
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", farTs)
      val stage = base.resolve("stage").toString
      sentinel.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, src.resolve("sentinel.parquet"))
      runOnce()
      s.read.parquet(out).filter(col("user_id") >= 0)
    }),

    // watermarked stream-stream INTERVAL join (click attribution): each
    // view joined to same-user clicks within [view_ts, view_ts+10min].
    // Inner join emits each match exactly once; the time bound is what
    // lets the state store evict — the oracle is the equivalent batch
    // self-join.
    "stream_join_interval" -> ((s, d) => {
      val ev = eventsStream(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      StreamOps.runToMemory(
        StreamOps.intervalJoin(views, clicks, "user_id",
          "view_ts", "click_ts", windowMinutes = 10),
        outputMode = "append")
        .select("user_id", "view_id", "click_id")
    }),

    // stateful streaming dedupe (dropDuplicatesWithinWatermark state
    // store). Keys only in the output: WHICH row survives per key depends
    // on partition arrival order, but the key SET is deterministic — the
    // batch-SQL oracle is DISTINCT. Cross-batch survivor semantics are
    // covered by StreamingSpec.
    "stream_dedupe" -> ((s, d) =>
      StreamOps.runToMemory(
        eventsStream(s, d)
          .withWatermark("ts", "24 hours")
          .dropDuplicatesWithinWatermark("user_id", "event_type"),
        outputMode = "append")
        .select(col("user_id"), col("event_type"))
        // a key CAN legitimately be re-emitted across micro-batches once
        // the watermark expires its dedupe state; collapse to the key set
        // so the DISTINCT oracle holds for any batch split, not just the
        // single-batch AvailableNow drain
        .distinct()),

    // custom streaming state (flatMapGroupsWithState): per-user running
    // (count, max) in the state store. One AvailableNow batch over the
    // bounded input ⇒ one emission per key with the final totals, so the
    // batch-SQL oracle is a plain groupBy. Cross-batch accumulation is
    // StreamingSpec's half.
    "stream_stateful_count" -> ((s, d) =>
      StreamOps.runToMemory(
        StreamOps.statefulUserCounts(eventsStream(s, d)),
        outputMode = "append")
        // append mode emits the RUNNING totals once per micro-batch a key
        // appears in; both columns are monotone per key, so max() selects
        // the final emission — the oracle stays correct even if the source
        // ever splits the bounded input into multiple batches
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"),
          max("max_event_id").as("max_event_id"))),

    // streaming upsert sink: foreachBatch → batched JDBC PK-upsert into
    // Derby → read the accumulated table back. keep-last by event_id per
    // key inside each batch, so the result equals batch keep-last dedupe.
    "stream_upsert_sink" -> ((s, d) => {
      val sink = graft.sink.JdbcSink("jdbc:derby:memory:streamupq;create=true")
      val stream = eventsStream(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"))
      val q = StreamOps.upsertEachBatch(stream, sink, "st_upsert",
        Seq("user_id", "event_type"), "event_id")
      q.awaitTermination()
      // the keep-last-by-event_id oracle relies on the bounded source
      // draining in ONE micro-batch (across batches the upsert is
      // last-batch-wins, which only equals keep-last if event_ids arrive
      // in order) — assert that precondition instead of silently
      // diverging if a trigger limit is ever configured
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"stream_upsert_sink oracle requires a single-batch drain, saw $dataBatches data batches")
      sink.readBack(s, "st_upsert")
    }),

    // watermark semantics end-to-end: two CSV files arrive in two separate
    // runs of the SAME checkpointed query (watermark state persists in the
    // checkpoint — AvailableNow processes everything present in one batch,
    // so sequential runs are how distinct watermark epochs are driven).
    // File 2 carries an event BEHIND the watermark established by file 1 —
    // it must be dropped from the windowed aggregate, and only
    // watermark-closed windows are emitted in append mode. The oracle is
    // the exact literal expectation, so a broken drop (extra/bumped window
    // row) and broken finalization (missing row) both fail the compare.
    "stream_late_data" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_late_fixture")
      // fresh fixture every call: the checkpoint must not remember a
      // previous run or no batches would fire at all
      val src = base.resolve("src"); Files.createDirectories(src)
      val out = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      def runOnce(): Unit = {
        // small state-store count for the 4-row fixture (see runToMemory);
        // the lock covers only start() — await runs unlocked
        val q = StreamOps.withStatePartitions(s, 4) {
          StreamOps.fileStreamCsv(s, s"$src/*.csv", schema)
            .withWatermark("ts", "10 minutes")
            .groupBy(window(col("ts"), "10 minutes"))
            .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("sum_v"))
            .select(col("window.start").as("win_start"), col("n"),
              col("sum_v"))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        q.awaitTermination()
      }
      // run 1: establishes watermark max(ts)-10min = 10:20
      Files.write(src.resolve("f1.csv"),
        "ts,v\n2024-01-01 10:05:00,1.0\n2024-01-01 10:30:00,2.0\n"
          .getBytes("UTF-8"))
      runOnce()
      // run 2: 10:06 is behind the restored 10:20 watermark -> dropped;
      // 12:00 advances the watermark to 11:50, closing the 10:30 window
      Files.write(src.resolve("f2.csv"),
        "ts,v\n2024-01-01 10:06:00,99.0\n2024-01-01 12:00:00,3.0\n"
          .getBytes("UTF-8"))
      runOnce()
      s.read.parquet(out)
    }),

    // streaming incremental ingestion dedupe: two sequential runs of one
    // checkpointed query (distinct micro-batch epochs); run 2 carries a
    // cross-run duplicate (dropped vs the PERSISTENT key table), a fresh
    // doc (landed), and an intra-batch duplicate (keep-first). The
    // unbounded-history shape dropDuplicatesWithinWatermark cannot
    // express — see StreamOps.incrementalDedupeEachBatch. Oracle is the
    // exact literal expectation.
    // streaming SEQUENCE PACKING — continuous corpus packing with ONE
    // LONG of state per group (the next write offset); history is never
    // re-packed. One AvailableNow pass over the static corpus must
    // reproduce the batch concat-then-chunk layout exactly (the oracle
    // is the same running-sum SQL as pipeline_pack_tokens); multi-epoch
    // offset continuation is pinned by StreamingSpec.
    "stream_pack_tokens" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = s.read.parquet(s"$d/documents.parquet")
      StreamOps.runToMemory(
        StreamOps.packSequencesStream(
          StreamOps.fileStreamParquet(s, s"$d/documents.parque*",
            batch.schema),
          "doc_id", "lang", "text", budgetTokens = 2048),
        outputMode = "append")
    }),

    // the composed streaming corpus job: stateless curation (lang →
    // length → quality — every rule a per-row expression, so the SAME
    // chain as batch curate minus its corpus-window duplicate rule,
    // which streaming composes via the incremental-dedupe tier instead)
    // feeding continuous sequence packing whose offsets carry across
    // micro-batches. Filter-then-state composes cleanly because the
    // curation is a plain predicate on the streaming frame.
    "stream_curate_pack" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = s.read.parquet(s"$d/documents.parquet")
      val kept = StreamOps.fileStreamParquet(
          s, s"$d/documents.parque*", batch.schema)
        .filter(graft.ops.TextOps.curateStatelessReason(
          "text", minTokens = 20, maxTokens = 90, minQuality = 0.58)
          .isNull)
      StreamOps.runToMemory(
        StreamOps.packSequencesStream(
          kept, "doc_id", "lang", "text", budgetTokens = 2048),
        outputMode = "append")
    }),

    // the web-crawl front door in its streaming posture: crawled pages
    // arrive as a file stream and main-content extraction is a
    // STATELESS per-row projection (the same column-expression pipeline
    // as batch — no state store, no watermark), so one AvailableNow
    // pass over the static corpus reproduces text_html_extract exactly
    // and the closed-form oracle is shared verbatim. This is the shape
    // a continuous crawl ingest runs at any scale: extraction
    // parallelism = file-source partitioning, zero shuffle.
    "stream_html_extract" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = s.read.parquet(s"$d/documents.parquet")
      val pages = StreamOps.fileStreamParquet(
          s, s"$d/documents.parque*", batch.schema)
        .select(col("doc_id"), col("text"))
      StreamOps.runToMemory(
        pages.select(col("doc_id"),
          graft.ops.TextOps.htmlTitle(TextQueries.syntheticPageHtml)
            .as("title"),
          graft.ops.TextOps.htmlMainText(TextQueries.syntheticPageHtml)
            .as("main_text")),
        outputMode = "append")
    }),

    // streaming NB classification — the trained quality/domain filter
    // in its deployed posture: the model is FROZEN batch-side
    // (CorpusOps.nbTrainModel on the seeded split, the cadence a
    // production filter retrains on) and every arriving micro-batch is
    // scored statelessly against the broadcast model. One AvailableNow
    // pass over the static corpus reproduces the batch entry exactly,
    // so this shares pipeline_classifier_nb's oracle verbatim.
    // DSIR data selection in its deployed posture: the B-row score
    // relation is frozen batch-side (the fit artifact), every arriving
    // micro-batch scores statelessly against it — no cross-batch state
    // (a document arrives whole), so one AvailableNow pass ≡ the batch
    // sample_dsir and the oracle is shared verbatim.
    "stream_dsir" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_dsirstream_fixture")
      Files.createDirectories(base)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchDocs = s.read.parquet(s"$d/documents.parquet")
      val scores = graft.ops.CorpusOps.dsirScores(batchDocs, "text",
        isTarget = col("source").isin("src1", "src2", "src3"))
        .localCheckpoint() // freeze: the fit never re-runs per batch
      val q = StreamOps.dsirEachBatch(
        StreamOps.fileStreamParquet(s, s"$d/documents.parque*",
          batchDocs.schema),
        scores, "doc_id", "text", s"$base/out", Some(s"$base/ckpt"))
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select("doc_id", "n_tokens", "lw_per_token", "selected")
    }),

    // BM25 scoring in its deployed posture: the query-vocabulary df
    // table, n_docs/avgdl and the query token sets are FROZEN batch-side
    // (the index-build cadence) and every arriving micro-batch scores
    // statelessly against the broadcast artifacts — a doc arrives whole,
    // so its tf/dl are batch-local and one AvailableNow pass over the
    // static corpus ≡ batch TextOps.bm25 (oracle = the shared lex CTE).
    "stream_bm25_score" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_bm25stream_fixture")
      Files.createDirectories(base)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchDocs = s.read.parquet(s"$d/documents.parquet")
      val qtok = TextQueries.bm25QueryTokens(batchDocs).localCheckpoint()
      val (dfreq, stats) = graft.ops.TextOps.bm25Fit(
        TextQueries.bm25Corpus(batchDocs), "doc_id", "text", qtok)
      val q = StreamOps.bm25EachBatch(
        TextQueries.bm25Corpus(
          StreamOps.fileStreamParquet(s, s"$d/documents.parque*",
            batchDocs.schema)),
        qtok, dfreq.localCheckpoint(), stats.localCheckpoint(),
        "doc_id", "text", s"$base/out", Some(s"$base/ckpt"))
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select("query_id", "doc_id", "score6", "n_terms", "bm25")
    }),

    "stream_classify_nb" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_nbstream_fixture")
      Files.createDirectories(base)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchDocs = s.read.parquet(s"$d/documents.parquet")
      val model = graft.ops.CorpusOps.nbTrainModel(batchDocs, "doc_id",
        "text", "lang", isTrain = pmod(col("doc_id"), lit(3)) =!= 0)
      val q = StreamOps.classifyEachBatch(
        StreamOps.fileStreamParquet(s, s"$d/documents.parque*",
          batchDocs.schema),
        model, "doc_id", "text", "lang",
        s"$base/out", Some(s"$base/ckpt"))
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select("doc_id", "pred", "score", "is_correct")
    }),

    // streaming incremental NEAR-DUP dedupe — the MinHash tier of
    // stream_incremental_dedupe: a doc never lands when its verified
    // Jaccard against anything already landed (or a lower-id
    // batch-mate) reaches 0.5. One AvailableNow batch over the static
    // corpus ⇒ survivors = docs with no lower-id near-dup — the same
    // exact-Jaccard pair relation as dedupe_minhash_lsh's oracle
    "stream_neardup_dedupe" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_neardup_fixture")
      Files.createDirectories(base)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val q = StreamOps.neardupDedupeEachBatch(
        StreamOps.fileStreamParquet(s, s"$d/documents.parque*", schema),
        "doc_id", "text",
        s"$base/bands", s"$base/out", s"$base/ckpt")
      q.awaitTermination()
      s.read.parquet(s"$base/out").select("doc_id", "lang", "text")
    }),

    // streaming CDC apply: an I/U/D change stream maintains a keyed
    // snapshot table in the JDBC sink — per batch, collapse to the
    // latest change per key, then idempotent PK upsert + PK delete
    // (replay-safe with no partition machinery). The scenario covers
    // update-then-delete (%60: U@1 then D@2 → gone unless also %9),
    // delete-then-resurrect (%45: D@2 then U@3 → back with the U
    // image), plain updates, inserts of unseen keys, and untouched
    // pass-through.
    "stream_cdc_apply" -> ((s, d) => {
      // snapshot = every third order key: the JDBC preload is bench
      // setup, not the operator under test — the CDC apply itself only
      // ever touches the (small) change log
      val snap = Tables.orders(s, d)
        .filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val k = col("o_orderkey")
      val nullC = lit(null).cast("bigint")
      val nullP = lit(null).cast("double")
      // seq = deterministic intra-ts tiebreak (changelog position), so
      // the latest-per-key pick is a TOTAL order even if two same-key
      // changes ever share a ts — mirrors sink_cdc_apply's orderCols
      def chg(pred: org.apache.spark.sql.Column,
          key: org.apache.spark.sql.Column, cust: org.apache.spark.sql.Column,
          price: org.apache.spark.sql.Column, op: String, ts: Long,
          seq: Long) =
        snap.filter(pred).select(key.as("o_orderkey"),
          cust.as("o_custkey"), price.as("o_totalprice"),
          lit(op).as("op"), lit(ts).as("ts"), lit(seq).as("seq"))
      val changes =
        chg(k % 12 === 0, k, col("o_custkey"),
          col("o_totalprice") + 50.0, "U", 1L, 1L)
        .unionByName(chg(k % 15 === 0, k, nullC, nullP, "D", 2L, 2L))
        .unionByName(chg(k % 9 === 0, k, col("o_custkey"),
          col("o_totalprice") + 70.0, "U", 3L, 3L))
        .unionByName(chg(k % 30 === 0, k + 3000000L, col("o_custkey"),
          lit(2.0), "I", 1L, 4L))
      val tmp = s"${Fixtures.root}/graft_cdc_fixture_seq/${Fixtures.key(s, s"$d/orders.parquet")}"
      if (!Fixtures.exists(s, tmp))
        changes.write.mode("overwrite").parquet(tmp)
      val sink = graft.sink.JdbcSink("jdbc:derby:memory:streamcdc;create=true")
      // fresh state every invocation: the stream starts from a fresh
      // checkpoint and replays the whole log, so the table must start
      // from the snapshot (a previous run may have applied deletes).
      // The snapshot is JDBC-inserted ONCE per JVM into a pristine base
      // table; each run rebuilds the working table with an IN-ENGINE
      // INSERT..SELECT (one statement) instead of re-shipping ~50k rows
      // through the driver — bench setup cost, not the operator's.
      sink.ensureTable("st_cdc", snap.schema, Seq("o_orderkey"))
      // content-keyed base name: a JVM that touches several sf dirs gets
      // one pristine base per source snapshot
      val base = s"st_cdc_base_${Fixtures.key(s, s"$d/orders.parquet").take(8)}"
      if (!sink.tableExists(base)) {
        sink.ensureTable(base, snap.schema, Seq("o_orderkey"))
        sink.insert(snap, base)
      }
      sink.truncate("st_cdc")
      val conn = sink.connect()
      try conn.createStatement()
        .executeUpdate(s"""INSERT INTO "st_cdc" SELECT * FROM "$base"""")
      finally conn.close()
      val q = StreamOps.cdcApplyEachBatch(
        StreamOps.fileStreamParquet(s, tmp, changes.schema),
        sink, "st_cdc", Seq("o_orderkey"), Seq("ts", "seq"))
      q.awaitTermination()
      // cross-batch ordering only equals the global latest-per-key pick
      // if the bounded log drains in one batch — assert, don't assume
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"stream_cdc_apply oracle requires a single-batch drain, saw $dataBatches")
      sink.readBack(s, "st_cdc")
    }),

    // streaming as-of enrichment: the join_asof scenario (events
    // enriched with each user's latest order at-or-before the event)
    // driven through per-batch as-of joins against the static orders
    // table — exact under any batch split, so the oracle IS
    // join_asof's.
    "stream_asof_enrich" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_asofstream_fixture")
      val outDir = base.resolve("out").toString
      val q = StreamOps.asofEnrichEachBatch(
        eventsStream(s, d).select("event_id", "user_id", "ts"),
        Tables.orders(s, d),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightTieBreak = "o_orderkey",
        rightValueCols = Seq("o_orderkey", "o_totalprice"),
        outDir = outDir)
      q.awaitTermination()
      s.read.parquet(outDir)
        .select("event_id", "user_id", "asof_o_orderkey",
          "asof_o_totalprice")
    }),

    // streaming SCD2: the sink_scd2 scenario driven through the
    // liveness-split dimension store (append-only closed log +
    // generation-swapped current set) — same seed dim, same update
    // batch, same effective ts, so the assembled dimension must equal
    // the batch merge exactly (the oracle IS sink_scd2's).
    "stream_scd2" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_scd2_fixture")
      val dimDir = base.resolve("dim").toString
      val srcDir = base.resolve("src").toString
      val c = Tables.customer(s, d)
      // seed: open versions as generation -1, pre-existing closed
      // versions as closed batch -1 (the layout a previous stream run
      // would have left)
      c.select(col("c_custkey"), col("c_mktsegment"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          lit(true).as("is_current"))
        .write.parquet(s"$dimDir/current/__gen=-1")
      c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"),
          concat(lit("OLD-"), col("c_mktsegment")).as("c_mktsegment"),
          lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_to"),
          lit(false).as("is_current"))
        .write.parquet(s"$dimDir/closed/__batch_id=-1")
      val updates = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("-v2")).as("c_mktsegment"))
        .unionByName(c.filter(col("c_custkey") % 3 === 1)
          .select("c_custkey", "c_mktsegment"))
        .unionByName(c.filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            lit("NEW").as("c_mktsegment")))
      updates.write.parquet(srcDir)
      val q = StreamOps.scd2EachBatch(
        StreamOps.fileStreamParquet(s, srcDir, updates.schema),
        Seq("c_custkey"), Seq("c_mktsegment"), dimDir,
        _ => lit("2025-06-01 00:00:00").cast("timestamp"))
      q.awaitTermination()
      StreamOps.scd2Dim(s, dimDir)
    }),

    "stream_incremental_dedupe" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_incdedup_fixture")
      val src = base.resolve("src"); Files.createDirectories(src)
      val keyDir = base.resolve("keys").toString
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("body",
          org.apache.spark.sql.types.StringType)))
      def runOnce(): Unit = {
        val q = StreamOps.withStatePartitions(s, 4) {
          StreamOps.incrementalDedupeEachBatch(
            StreamOps.fileStreamCsv(s, s"$src/*.csv", schema),
            "doc_id", "body", keyDir, outDir, ckpt)
        }
        q.awaitTermination()
      }
      // run 1: two distinct docs — both land, keys recorded
      Files.write(src.resolve("f1.csv"),
        "doc_id,body\n1,alpha one\n2,beta two\n".getBytes("UTF-8"))
      runOnce()
      // run 2: 3 duplicates doc 1 (dropped vs the PERSISTENT key table),
      // 4 is fresh (lands), 5 duplicates 4 within the batch (keep-first)
      Files.write(src.resolve("f2.csv"),
        "doc_id,body\n3,alpha one\n4,gamma three\n5,gamma three\n"
          .getBytes("UTF-8"))
      runOnce()
      s.read.parquet(outDir).select("doc_id", "body")
    }),

    // streaming incremental SEMANTIC dedupe — the vector twin of
    // stream_incremental_dedupe: run 1 lands two orthogonal embeddings;
    // run 2's near-dup of a landed vector (cos≈0.98) is dropped against
    // the PERSISTENT cell table, a fresh orthogonal vector lands, and
    // an intra-batch near-dup of it (cos≈0.99) is dropped keep-first.
    // Quantizer trains once on batch 0 and persists, so cell ids are
    // stable across runs and replays.
    "stream_embed_dedupe" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_embeddedupe_fixture")
      val src = base.resolve("src").toString
      val cellDir = base.resolve("cells").toString
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      import s.implicits._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))
      def runOnce(): Unit = {
        val q = StreamOps.embedDedupeEachBatch(
          StreamOps.fileStreamParquet(s, src, schema),
          "vec_id", "embedding", cellDir, outDir, ckpt,
          threshold = 0.9, nCentroids = 2, nAssign = 2)
        q.awaitTermination()
      }
      Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding")
        .write.mode("append").parquet(src)
      runOnce()
      Seq((3L, Seq(0.98f, 0.199f, 0f, 0f)),   // cos vs landed 1 ≈ 0.98
          (4L, Seq(0f, 0f, 1f, 0f)),          // fresh — lands
          (5L, Seq(0f, 0f, 0.99f, 0.141f)))   // cos vs batch-mate 4 ≈ 0.99
        .toDF("vec_id", "embedding")
        .write.mode("append").parquet(src)
      runOnce()
      s.read.parquet(outDir)
        .select(col("vec_id"), size(col("embedding")).as("n_dims"))
    }),

    // STREAMING SemDeDup — the streaming posture of the corpus-scale
    // semantic tier (dedupe_embed_semdedup): the k-scaled quantizer
    // (k = semdedupK(n), the exact frozen pre-update Lloyd centroids)
    // is trained batch-side and PERSISTED; each micro-batch assigns its
    // vectors to cells against that frozen model, verifies exact cosine
    // against earlier-batch landed vectors of the SAME cell (the layout
    // read prunes on BOTH (cell, __batch_id) partition dimensions) plus
    // its same-cell batch mates, and lands pairs + vectors replay-
    // idempotently. Because per-vector cells equal the batch tier's and
    // the per-batch pair sets tile the same-cell pair relation, the
    // accumulated pairs equal dedupe_embed_semdedup's pair relation for
    // ANY batching — so the final closure shares that entry's
    // Lloyd-replay oracle verbatim.
    "stream_embed_semdedup" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_semdedup_stream_fixture")
      val src = base.resolve("src").toString
      val quantDir = base.resolve("quantizer").toString
      val layout = base.resolve("layout").toString
      val pairsDir = base.resolve("pairs").toString
      val ckpt = base.resolve("ckpt").toString
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val k = graft.ops.VectorOps.semdedupK(emb.count())
      // train + PERSIST the quantizer RELATION, then stream against the
      // loaded table — the model is never collected (k scales with n)
      graft.ops.VectorOps.semdedupQuantizer(
          emb, "vec_id", "embedding", k, iters = 3)
        .write.parquet(quantDir)
      val frozen = s.read.parquet(quantDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))
      def runOnce(): Unit = {
        val q = StreamOps.semdedupEachBatch(
          StreamOps.fileStreamParquet(s, src, schema),
          "vec_id", "embedding", frozen, threshold = 0.45,
          layout, pairsDir, ckpt)
        q.awaitTermination()
      }
      (0 until 3).foreach { r =>
        emb.filter(pmod(col("vec_id"), lit(3)) === r)
          .write.mode("append").parquet(src)
        runOnce()
      }
      val pairs = s.read.parquet(pairsDir).select("id1", "id2")
      graft.ops.Clusters.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))
    }),

    // streaming data-quality gate: two checkpointed micro-batches land
    // per-batch (rule, n_violations) report partitions; the read side
    // sums across batches, which must equal the batch-free computation
    // over everything ever ingested (pinned by the literal oracle —
    // three failing rules, one passing). Batch 1's bad timestamp proves
    // the accumulation is really per-batch, not a rescan.
    "stream_dq_checks" -> ((s, d) => {
      val base = Fixtures.freshDir("graft_streamdq_fixture")
      val src = base.resolve("src"); Files.createDirectories(src)
      val outDir = base.resolve("report").toString
      val ckpt = base.resolve("ckpt").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ts_str",
          org.apache.spark.sql.types.StringType)))
      val rules = Seq(
        "k_not_null" -> col("k").isNull,
        "v_nonneg" -> (col("v") < 0),
        "ts_parses" ->
          (expr("try_to_timestamp(ts_str)").isNull && col("ts_str").isNotNull),
        "v_under_1000" -> (col("v") >= 1000))
      def runOnce(): Unit =
        StreamOps.dqReportEachBatch(
          StreamOps.fileStreamCsv(s, s"$src/*.csv", schema),
          rules, outDir, Some(ckpt)).awaitTermination()
      // batch 0: one null key, one negative value
      Files.write(src.resolve("b0.csv"),
        "k,v,ts_str\n1,1.5,2024-01-01 10:00:00\n,2.0,2024-01-01 11:00:00\n2,-5.0,2024-01-01 12:00:00\n"
          .getBytes("UTF-8"))
      runOnce()
      // batch 1: one unparseable timestamp
      Files.write(src.resolve("b1.csv"),
        "k,v,ts_str\n3,4.0,not-a-timestamp\n4,0.5,2024-01-02 09:00:00\n"
          .getBytes("UTF-8"))
      runOnce()
      s.read.parquet(outDir)
        .groupBy("rule").agg(sum("n_violations").as("n_violations"))
        .withColumn("pass", col("n_violations") === 0L)
    }),

    // CSV file stream with a deterministic runtime fixture; oracle is a
    // literal VALUES table. Exercises schema-pinned streaming CSV ingest.
    "stream_ingest_files" -> ((s, d) => {
      val dir = Paths.get(s"${Fixtures.root}/graft_stream_fixture")
      Files.createDirectories(dir)
      Seq(("a.csv", "k,v\n1,10.5\n2,20.5\n"), ("b.csv", "k,v\n3,30.5\n"))
        .foreach { case (n, content) =>
          Files.write(dir.resolve(n), content.getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      StreamOps.runToMemory(
        StreamOps.fileStreamCsv(s, s"$dir/*.csv", schema),
        outputMode = "append")
    }),

    // LIVE EFFECT-SIZE MONITOR — agg_cohens_d's streaming face: per-day
    // Cohen's d of purchase-vs-view value, the "is the shift big enough
    // to matter" number a live A/B dashboard shows next to its p-value.
    // State is tiny and bounded: THREE exact integer moments (n, Σc,
    // Σc², cents scale) per (day window, arm) — the sufficient-
    // statistics discipline means the stream never holds values, only
    // moments, so a day of any size is 2 state rows. The d assembly is
    // the same mirrored straight-line double as the batch entry,
    // computed as a batch projection on the materialized aggregate.
    // Days missing an arm (or with zero pooled variance) emit null d.
    "stream_effect_size" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val src = eventsStream(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(src, "ts", "1 day", Seq("event_type"),
          Seq(count(lit(1)).as("n"), sum(col("c").cast(dec)).as("s1"),
            sum(col("c").cast(dec) * col("c")).as("s2"))),
        outputMode = "complete")
        .select(col("event_type"), col("window.start").as("day_start"),
          col("n"), col("s1"), col("s2"))
      def arm(isA: Boolean, c: String, out: String) =
        coalesce(sum(when(col("event_type") ===
          (if (isA) "purchase" else "view"), col(c))), lit(0).cast(dec))
          .as(out)
      val m = agged.groupBy("day_start").agg(
        coalesce(sum(when(col("event_type") === "purchase", col("n"))),
          lit(0L)).as("na"),
        coalesce(sum(when(col("event_type") === "view", col("n"))),
          lit(0L)).as("nb"),
        arm(true, "s1", "sa"), arm(false, "s1", "sb"),
        arm(true, "s2", "qa"), arm(false, "s2", "qb"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      val ssa = D(col("qa")) - D(col("sa")) * D(col("sa")) / D(col("na"))
      val ssb = D(col("qb")) - D(col("sb")) * D(col("sb")) / D(col("nb"))
      val df = D(col("na")) + D(col("nb")) - 2
      m.select(col("day_start"), col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        when(col("na") >= 2 && col("nb") >= 2 && ssa + ssb > 0,
          StableRound.round6(
            (D(col("sa")) / D(col("na")) - D(col("sb")) / D(col("nb"))) /
              sqrt((ssa + ssb) / df))).as("cohens_d"))
    }),

    // LIVE RFM SEGMENTATION — agg_rfm's streaming face: the
    // recency/frequency/monetary grid kept current. State is one
    // (last_day, purchases, cents) triple per user — a plain streaming
    // max/sum agg, bounded at one row per user; the quintile
    // thresholds and map-side scoring run as the batch projection over
    // the materialized per-user table, identical to the batch entry —
    // so the oracle IS agg_rfm's.
    "stream_rfm" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val src = eventsStream(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
          (col("event_type") === "purchase").as("conv"),
          round(col("value") * 100).cast("long").as("c"))
      val lives = StreamOps.runToMemory(
        src.groupBy("user_id")
          .agg(max("day").as("last_day"),
            sum(when(col("conv"), 1L).otherwise(0L)).as("freq"),
            coalesce(sum(when(col("conv"), col("c"))), lit(0L))
              .as("mon")),
        outputMode = "complete").localCheckpoint()
      val mx = lives.agg(max("last_day").as("mxd"))
      val per = lives.crossJoin(broadcast(mx))
        .select(col("user_id"),
          datediff(col("mxd"), col("last_day")).cast("long").as("rec"),
          col("freq"), col("mon"))
        .localCheckpoint()
      def thresholds(c: String, p: String)
          : org.apache.spark.sql.DataFrame = {
        val dom = per.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        graft.ops.Prefix.belowBucketed(dom, "v",
            sums = Seq((col("cnt"), "cum")), inclusive = true)
          .crossJoin(broadcast(per.agg(count(lit(1)).as("n"))))
          .groupBy().agg(
            min(when(col("cum") >= expr("(n + 4) div 5"), col("v")))
              .as(s"${p}1"),
            min(when(col("cum") >= expr("(n * 2 + 4) div 5"), col("v")))
              .as(s"${p}2"),
            min(when(col("cum") >= expr("(n * 3 + 4) div 5"), col("v")))
              .as(s"${p}3"),
            min(when(col("cum") >= expr("(n * 4 + 4) div 5"), col("v")))
              .as(s"${p}4"))
      }
      def score(c: String, p: String) =
        lit(1) + (col(c) > col(s"${p}1")).cast("int") +
          (col(c) > col(s"${p}2")).cast("int") +
          (col(c) > col(s"${p}3")).cast("int") +
          (col(c) > col(s"${p}4")).cast("int")
      per
        .crossJoin(broadcast(thresholds("rec", "tr")))
        .crossJoin(broadcast(thresholds("freq", "tf")))
        .crossJoin(broadcast(thresholds("mon", "tm")))
        .select((lit(6) - score("rec", "tr")).as("r_score"),
          score("freq", "tf").as("f_score"),
          score("mon", "tm").as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_users"))
    }),

    // LIVE RETENTION SURVIVAL — agg_survival_km's streaming face: the
    // Kaplan–Meier curve kept current as events arrive. State is one
    // (first_day, last_day) pair per user (a plain streaming min/max
    // agg — bounded at one row per user at any volume); the censoring
    // rule, risk sets, and the fixed-point ln cumsum run as a batch
    // projection over the materialized per-user table, identical to
    // the batch entry — so the oracle IS agg_survival_km's.
    "stream_survival" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.StableRound
      val src = eventsStream(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val lives = StreamOps.runToMemory(
        src.groupBy("user_id")
          .agg(min("day").as("f"), max("day").as("l")),
        outputMode = "complete").localCheckpoint()
      val mx = lives.agg(max("l").as("mxd"))
      val per = lives.crossJoin(broadcast(mx))
        .select(datediff(col("l"), col("f")).cast("long").as("t"),
          when(col("l") === col("mxd"), 1).otherwise(0).as("cens"))
      val dom = per.groupBy("t")
        .agg(count(lit(1)).as("n_t"),
          sum(when(col("cens") === 0, 1L).otherwise(0L)).as("d_t"))
        .localCheckpoint()
      val tot = dom.agg(sum("n_t").as("n"))
      val steps = graft.ops.Prefix.belowBucketed(dom, "t",
          sums = Seq((col("n_t"), "below")), inclusive = false)
        .crossJoin(broadcast(tot))
        .withColumn("atrisk", col("n") - col("below"))
        .filter(col("d_t") > 0)
      val lterm = log((col("atrisk") - col("d_t")).cast("double")
        / col("atrisk").cast("double"))
      val stepped = steps
        .withColumn("l6", when(col("atrisk") > col("d_t"),
          floor(StableRound.round6(lterm) * 1e6 + 0.5).cast("long")))
        .localCheckpoint()
      graft.ops.Prefix.belowBucketed(stepped, "t",
          sums = Seq((col("l6"), "cum6")), inclusive = true)
        .select(col("t"), col("atrisk").as("n_at_risk"),
          col("d_t").as("n_events"),
          when(col("atrisk") > col("d_t"), StableRound.round6(
            exp(col("cum6").cast("double") / 1e6)))
            .otherwise(lit(0.0)).as("survival"))
    }),

    // LIVE MARKOV MONITOR — agg_markov_transitions' streaming face:
    // per-user transition pairs flow out of ONE-ROW-PER-USER custom
    // state (StreamOps.statefulTransitions — the last event seen is
    // the whole state), and the matrix assembles as a batch projection
    // over the appended pair stream. The corpus drains in one batch
    // here, so cross-batch arrival order is moot and the oracle IS the
    // batch entry's.
    "stream_markov" -> ((s, d) => {
      import graft.StableRound
      val pairs = StreamOps.runToMemory(
        StreamOps.statefulTransitions(eventsStream(s, d)),
        outputMode = "append")
      val counts = pairs.groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      val rowTot = counts.groupBy(col("cur").as("c2"))
        .agg(sum("n").as("rt"))
      counts.join(broadcast(rowTot), counts("cur") === rowTot("c2"))
        .select(col("cur"), col("nxt"), col("n"),
          StableRound.round6(
            col("n").cast("double") / col("rt").cast("double")).as("p"))
    }),

    // LIVE LEAD–LAG MONITOR — agg_xcorr's streaming face: the
    // cross-correlation of the daily purchase and view series at lags
    // −3..+3, kept current as events stream in. State is TWO integer
    // counters per day window (purchases, views) — 1 state row/day at
    // any volume; the zero-filled grid, 7-lag pairing, and moment
    // assembly run as a batch projection over the materialized
    // aggregate (a ≤31-row relation), exactly the batch entry's code
    // path — so the oracle IS agg_xcorr's.
    "stream_xcorr" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val src = eventsStream(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("ts"), (col("event_type") === "purchase").as("isp"))
      val counts = StreamOps.runToMemory(
        StreamOps.tumbling(src, "ts", "1 day", Seq.empty,
          Seq(sum(when(col("isp"), 1L).otherwise(0L)).as("x"),
            sum(when(!col("isp"), 1L).otherwise(0L)).as("y"))),
        outputMode = "complete")
        .select(col("window.start").as("day"), col("x"), col("y"))
        .localCheckpoint()
      val series = counts.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
        .join(counts, Seq("day"), "left")
        .na.fill(0L, Seq("x", "y"))
        .localCheckpoint()
      val lagDf = s.range(-3, 4).select(col("id").as("lag"))
      val sums = series.select(col("day"), col("x"))
        .crossJoin(broadcast(lagDf))
        .withColumn("dy", expr("day + make_interval(0, 0, 0, lag)"))
        .join(series.select(col("day").as("dy"), col("y")), Seq("dy"))
        .groupBy("lag").agg(
          count(lit(1)).cast(dec).as("m"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
      val vx = (col("m") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      val vy = (col("m") * col("syy") - col("sy") * col("sy"))
        .cast("double")
      sums.select(col("lag"), col("m").cast("long").as("n_days"),
        when(vx > 0 && vy > 0, StableRound.round6(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt(vx) * sqrt(vy)))).as("r"))
    }),

    // LIVE CONVERSION-RATE MONITOR — agg_two_prop_ztest's streaming
    // face: per-day pooled z of purchase rate between the
    // user-id-parity arms, the number a live experiment dashboard
    // plots hour by hour. State is two integer counters per (day, arm)
    // — (events, purchases) — so a day of any volume is 2 state rows
    // and the stream never holds events; the z assembly is the batch
    // entry's mirrored straight line, run as a batch projection over
    // the materialized aggregate. Days with an empty or degenerate
    // pool (p̂ ∈ {0,1}) emit null z.
    "stream_two_prop" -> ((s, d) => {
      val src = eventsStream(s, d)
        .select(col("ts"), (col("user_id") % 2 === 0).as("isa"),
          (col("event_type") === "purchase").as("conv"))
      val agged = StreamOps.runToMemory(
        StreamOps.tumbling(src, "ts", "1 day", Seq("isa"),
          Seq(count(lit(1)).as("n"),
            sum(when(col("conv"), 1L).otherwise(0L)).as("x"))),
        outputMode = "complete")
        .select(col("isa"), col("window.start").as("day_start"),
          col("n"), col("x"))
      val m = agged.groupBy("day_start").agg(
        coalesce(sum(when(col("isa"), col("n"))), lit(0L)).as("na"),
        coalesce(sum(when(!col("isa"), col("n"))), lit(0L)).as("nb"),
        coalesce(sum(when(col("isa"), col("x"))), lit(0L)).as("xa"),
        coalesce(sum(when(!col("isa"), col("x"))), lit(0L)).as("xb"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      val pa = D(col("xa")) / D(col("na"))
      val pb = D(col("xb")) / D(col("nb"))
      val pp = (D(col("xa")) + D(col("xb"))) /
        (D(col("na")) + D(col("nb")))
      m.select(col("day_start"),
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("xa").cast("long").as("x_a"),
        col("xb").cast("long").as("x_b"),
        when(col("na") > 0 && col("nb") > 0 && pp > 0 && pp < 1,
          StableRound.round6((pa - pb) /
            sqrt(pp * (lit(1.0) - pp)
              * (lit(1.0) / D(col("na")) + lit(1.0) / D(col("nb"))))))
          .as("z"))
    }),
  )

  def oracle: Map[String, String] = Map(
    // single-batch stream ≡ one batch merge: the oracle IS sink_scd2's
    "stream_scd2" -> IngestQueries.oracle("sink_scd2"),

    // watermark-flushed append sessions ≡ the batch gaps-and-islands
    "stream_sessionize" -> CoreQueries.oracle("agg_sessionize"),

    // exact under any batch split ⇒ the oracle IS join_asof's
    "stream_asof_enrich" -> RelationalQueries.oracle("join_asof"),

    // the accumulated table equals the batch CDC collapse of the same log
    "stream_cdc_apply" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 50.0 AS o_totalprice,
        |    'U' AS op, 1 AS ts FROM snap WHERE o_orderkey % 12 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |    'D', 2 FROM snap WHERE o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 70.0, 'U', 3
        |  FROM snap WHERE o_orderkey % 9 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 3000000, o_custkey, 2.0, 'I', 1
        |  FROM snap WHERE o_orderkey % 30 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY ts DESC) AS rn
        |    FROM chg) WHERE rn = 1)
        |SELECT s.* FROM snap s
        |WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM latest
        |WHERE op <> 'D'""".stripMargin,

    "stream_window_tumbling" ->
      """SELECT event_type,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |  count(*) AS n, CAST(round(CAST(avg(value) AS DECIMAL(27,12)), 6) AS DOUBLE) AS avg_value
        |FROM events GROUP BY event_type, bucket_start""".stripMargin,

    // same sorted-list lower-median/MAD integer pipeline as the Spark
    // projection — stream/batch parity is the assertion
    "stream_anomaly_mad" ->
      """WITH b AS (SELECT event_type,
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |    CAST(round(value*100) AS BIGINT) AS c FROM events),
        |g AS (SELECT event_type, bucket_start, list_sort(list(c)) AS arr,
        |    count(*) AS n FROM b GROUP BY 1, 2),
        |m AS (SELECT *, arr[(n+1)//2] AS med FROM g),
        |d AS (SELECT *,
        |    list_sort(list_transform(arr, x -> abs(x - med)))[(n+1)//2]
        |      AS mad FROM m)
        |SELECT event_type, bucket_start, n, med AS med_cents,
        |  mad AS mad_cents,
        |  len(list_filter(arr, x -> 10000*abs(x - med) > 44478*mad))
        |    AS n_anomalies
        |FROM d""".stripMargin,

    // batch twin of the streaming per-day PSI: same bins, same baseline,
    // same integer-lifted log recipe as agg_psi_drift
    // PSI's per-day grid with the KL weight/normalizer (see agg_kl_drift)
    "stream_kl_drift" -> {
      def l6(e: String) =
        s"CAST(floor(${graft.StableRound.sql6(s"ln($e)")} " +
          "* 1000000 + 0.5) AS BIGINT)"
      s"""WITH b AS (SELECT event_type,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
         |    ts < TIMESTAMP '2024-01-16 00:00:00' AS fh,
         |    least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000, 9)
         |      AS bin
         |  FROM events),
         |c AS (SELECT event_type, day_start, bin,
         |    CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
         |r AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cr
         |  FROM b WHERE fh GROUP BY 1, 2),
         |rt AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS nr
         |  FROM r GROUP BY 1),
         |dt AS (SELECT event_type, day_start, CAST(sum(c) AS BIGINT) AS nd
         |  FROM c GROUP BY 1, 2),
         |g AS (SELECT dt.event_type, dt.day_start, dt.nd, rt.nr, bb.bin,
         |    coalesce(c.c, 0) AS c, coalesce(r.cr, 0) AS cr
         |  FROM dt JOIN rt USING (event_type)
         |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) bb
         |  LEFT JOIN c ON c.event_type = dt.event_type
         |    AND c.day_start = dt.day_start AND c.bin = bb.bin
         |  LEFT JOIN r ON r.event_type = dt.event_type AND r.bin = bb.bin),
         |s AS (SELECT event_type, day_start, nd, nr,
         |    CAST(sum((c+1) *
         |        (${l6("c+1")} - ${l6("nd+10")}
         |         - ${l6("cr+1")} + ${l6("nr+10")})) AS BIGINT) AS ssum6
         |  FROM g GROUP BY 1, 2, 3, 4)
         |SELECT event_type, day_start, nd AS n_day, nr AS n_ref,
         |  ${graft.StableRound.sql6("CAST(ssum6 AS DOUBLE) / 1000000.0 " +
               "/ CAST(nd+10 AS DOUBLE)")} AS kl
         |FROM s""".stripMargin
    },

    // identical recipe to the batch entry (already day-grained)
    "stream_shannon_diversity" ->
      StatsQueries.oracle("agg_shannon_diversity"),

    // first-half fences via the ceil-division discrete quartiles, then
    // per-day integer counts — all BIGINT
    "stream_outlier_iqr" ->
      """WITH dom AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS c, count(*) AS cnt
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1, 2),
        |cum AS (SELECT event_type, c, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM dom),
        |q AS (SELECT event_type,
        |    min(CASE WHEN cum >= (n + 3) // 4 THEN c END) AS q1,
        |    min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN c END) AS q3
        |  FROM cum GROUP BY 1),
        |f AS (SELECT event_type, q1 * 2 - (q3 - q1) * 3 AS lo2,
        |    q3 * 2 + (q3 - q1) * 3 AS hi2 FROM q)
        |SELECT CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day_start,
        |  e.event_type,
        |  CAST(count(*) AS BIGINT) AS n_day,
        |  CAST(sum(CASE WHEN CAST(round(e.value * 100) AS BIGINT) * 2
        |      < f.lo2 OR CAST(round(e.value * 100) AS BIGINT) * 2 > f.hi2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1, 2""".stripMargin,

    // batch twin of the per-day digit counts; cent-integer leading
    // digit, shares under round6
    "stream_benford" ->
      s"""WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
         |      AS day_start,
         |    CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
         |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |  FROM events),
         |c AS (SELECT day_start, digit, CAST(count(*) AS BIGINT) AS n_d
         |  FROM d GROUP BY 1, 2),
         |t AS (SELECT day_start, sum(n_d) AS n FROM c GROUP BY 1)
         |SELECT c.day_start, c.digit, c.n_d,
         |  ${graft.StableRound.sql6(
              "CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE)")} AS share
         |FROM c JOIN t USING (day_start)""".stripMargin,

    "stream_psi_drift" -> {
      def l6(e: String) =
        s"CAST(floor(${graft.StableRound.sql6(s"ln($e)")} " +
          "* 1000000 + 0.5) AS BIGINT)"
      s"""WITH b AS (SELECT event_type,
         |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
         |    ts < TIMESTAMP '2024-01-16 00:00:00' AS fh,
         |    least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000, 9)
         |      AS bin
         |  FROM events),
         |c AS (SELECT event_type, day_start, bin,
         |    CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
         |r AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cr
         |  FROM b WHERE fh GROUP BY 1, 2),
         |rt AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS nr
         |  FROM r GROUP BY 1),
         |dt AS (SELECT event_type, day_start, CAST(sum(c) AS BIGINT) AS nd
         |  FROM c GROUP BY 1, 2),
         |g AS (SELECT dt.event_type, dt.day_start, dt.nd, rt.nr, bb.bin,
         |    coalesce(c.c, 0) AS c, coalesce(r.cr, 0) AS cr
         |  FROM dt JOIN rt USING (event_type)
         |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) bb
         |  LEFT JOIN c ON c.event_type = dt.event_type
         |    AND c.day_start = dt.day_start AND c.bin = bb.bin
         |  LEFT JOIN r ON r.event_type = dt.event_type AND r.bin = bb.bin),
         |s AS (SELECT event_type, day_start, nd, nr,
         |    CAST(sum(((c+1)*(nr+10) - (cr+1)*(nd+10)) *
         |        (${l6("c+1")} - ${l6("nd+10")}
         |         - ${l6("cr+1")} + ${l6("nr+10")})) AS BIGINT) AS ssum6
         |  FROM g GROUP BY 1, 2, 3, 4)
         |SELECT event_type, day_start, nd AS n_day, nr AS n_ref,
         |  ${graft.StableRound.sql6("CAST(ssum6 AS DOUBLE) / 1000000.0 " +
               "/ CAST((nd+10)*(nr+10) AS DOUBLE)")} AS psi
         |FROM s""".stripMargin
    },

    // batch row_number twin of the bounded-state leaderboard; same
    // (cents DESC, event_id) total order
    "stream_topk" ->
      """WITH b AS (SELECT event_type,
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
        |    CAST(round(value * 100) AS BIGINT) AS c, event_id
        |  FROM events),
        |w AS (SELECT *, row_number() OVER (PARTITION BY event_type,
        |    bucket_start ORDER BY c DESC, event_id) AS rk FROM b)
        |SELECT event_type, bucket_start, CAST(rk AS INTEGER) AS rk,
        |  c AS value_cents, event_id
        |FROM w WHERE rk <= 3""".stripMargin,

    "stream_join_interval" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE"""
        .stripMargin,

    // each event belongs to the 2h windows starting at trunc(ts) and
    // trunc(ts)-1h
    "stream_window_sliding" ->
      """SELECT event_type, CAST(w AS TIMESTAMP) AS win_start, count(*) AS n
        |FROM (
        |  SELECT event_type,
        |    unnest([date_trunc('hour', ts),
        |            date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w
        |  FROM events)
        |GROUP BY event_type, w""".stripMargin,

    // gaps-and-islands: new session when the gap from the previous event
    // is >= 30 minutes (session windows are [start, last+gap))
    "stream_window_session" ->
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
        |  CAST(min(ts) AS TIMESTAMP) AS first_ts,
        |  count(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "stream_ingest_files" ->
      """SELECT CAST(k AS BIGINT) AS k, CAST(v AS DOUBLE) AS v
        |FROM (VALUES (1, 10.5), (2, 20.5), (3, 30.5)) AS t(k, v)"""
        .stripMargin,

    // one AvailableNow pass over the static corpus = the batch layout
    // (single batch ⇒ in-batch id sort is the global sort) — the SAME
    // running-sum oracle as pipeline_pack_tokens
    "stream_pack_tokens" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_offset
        |  FROM t)
        |SELECT doc_id, lang, n_tokens, start_offset,
        |  CAST(floor(start_offset / 2048) AS BIGINT) AS bin_id
        |FROM c""".stripMargin,

    // stateless-curate (withDup=false twin of the curate CTE) survivors
    // through the same running-sum pack layout
    "stream_curate_pack" ->
      (TextQueries.curateCteSql(withDup = false) + """,
        |sel AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents d
        |  JOIN (SELECT doc_id FROM c WHERE keep) k USING (doc_id)),
        |packed AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_offset
        |  FROM sel)
        |SELECT doc_id, lang, n_tokens, start_offset,
        |  CAST(floor(start_offset / 2048) AS BIGINT) AS bin_id
        |FROM packed""".stripMargin),

    // stateless projection — one AvailableNow pass ≡ the batch extract,
    // closed-form oracle shared verbatim
    "stream_html_extract" -> TextQueries.htmlExtractOracleSql,
    "stream_bm25_score" -> (TextQueries.bm25LexCte +
      s"""
        |SELECT query_id, doc_id, score6, n_terms,
        |  ${StableRound.sql6("score6 / 1000000.0")} AS bm25
        |FROM lex""".stripMargin),

    // survivors = docs with no lower-id exact-Jaccard≥0.5 partner (the
    // proven dedupe_minhash_lsh pair CTE — LSH recall on this corpus is
    // exact, pinned by that entry's own hash-green history)
    // one AvailableNow pass over the static corpus ≡ the batch
    // classifier — the model is frozen, scoring is stateless, so the
    // streaming face shares the batch oracle verbatim
    "stream_classify_nb" -> CorpusQueries.oracle("pipeline_classifier_nb"),

    // frozen fit + stateless per-batch apply ≡ the batch DSIR pass
    "stream_dsir" -> CorpusQueries.oracle("sample_dsir"),

    "stream_neardup_dedupe" ->
      s"""SELECT doc_id, lang, text FROM documents
         |WHERE doc_id NOT IN (SELECT d2 FROM (
         |${TextQueries.shingleCte(blocked = false)}
         |))""".stripMargin,

    // expected: run-1 docs land; run-2's cross-run dup (3) and
    // intra-batch dup (5) are dropped, fresh doc 4 lands
    "stream_incremental_dedupe" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, body
        |FROM (VALUES (1, 'alpha one'), (2, 'beta two'),
        |             (4, 'gamma three')) AS t(id, body)""".stripMargin,

    // expected: run-1 embeddings land; run-2's cross-run near-dup (3)
    // and intra-batch near-dup (5) are dropped, fresh vector 4 lands
    "stream_embed_dedupe" ->
      """SELECT CAST(id AS BIGINT) AS vec_id, CAST(4 AS INTEGER) AS n_dims
        |FROM (VALUES (1), (2), (4)) AS t(id)""".stripMargin,

    // the streaming tier reproduces the batch tier's pair relation for
    // any batching, so the oracle is the batch tier's Lloyd replay
    "stream_embed_semdedup" -> CorpusQueries.semdedupClustersSql,

    "stream_dq_checks" ->
      """SELECT rule, CAST(n AS BIGINT) AS n_violations, n = 0 AS pass
        |FROM (VALUES ('k_not_null', 1), ('v_nonneg', 1),
        |             ('ts_parses', 1), ('v_under_1000', 0))
        |  AS t(rule, n)""".stripMargin,

    "stream_dedupe" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "stream_stateful_count" ->
      """SELECT user_id, count(*) AS n_events,
        |  max(event_id) AS max_event_id
        |FROM events GROUP BY user_id""".stripMargin,

    "stream_upsert_sink" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    // expected: [10:00 window n=1 sum 1.0] (late 10:06 row DROPPED),
    // [10:30 window n=1 sum 2.0] (closed by the no-data batch after f2);
    // the [12:00) window stays open past the final watermark -> not emitted
    "stream_late_data" ->
      """SELECT CAST(w AS TIMESTAMP) AS win_start, CAST(n AS BIGINT) AS n,
        |  CAST(s AS DOUBLE) AS sum_v
        |FROM (VALUES (TIMESTAMP '2024-01-01 10:00:00', 1, 1.0),
        |             (TIMESTAMP '2024-01-01 10:30:00', 1, 2.0))
        |  AS t(w, n, s)""".stripMargin,

    // batch twin of the streaming moments: same six exact integer
    // sufficient statistics per day, same mirrored d assembly
    "stream_effect_size" -> {
      val ssa = "(CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) " +
        "* CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
      val ssb = "(CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) " +
        "* CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
      val df = "(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2)"
      val dEff = "((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) " +
        "- CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) " +
        s"/ sqrt(($ssa + $ssb) / $df))"
      s"""WITH v AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
         |      AS day_start,
         |    event_type = 'purchase' AS isa,
         |    CAST(round(value * 100) AS BIGINT) AS c FROM events
         |  WHERE event_type IN ('purchase', 'view')),
         |m AS (SELECT day_start,
         |    sum(CASE WHEN isa THEN 1 ELSE 0 END) AS na,
         |    sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS nb,
         |    coalesce(sum(CASE WHEN isa
         |      THEN CAST(c AS HUGEINT) END), 0) AS sa,
         |    coalesce(sum(CASE WHEN NOT isa
         |      THEN CAST(c AS HUGEINT) END), 0) AS sb,
         |    coalesce(sum(CASE WHEN isa
         |      THEN CAST(c AS HUGEINT) * c END), 0) AS qa,
         |    coalesce(sum(CASE WHEN NOT isa
         |      THEN CAST(c AS HUGEINT) * c END), 0) AS qb
         |  FROM v GROUP BY 1)
         |SELECT day_start, CAST(na AS BIGINT) AS n_a,
         |  CAST(nb AS BIGINT) AS n_b,
         |  CASE WHEN na >= 2 AND nb >= 2 AND $ssa + $ssb > 0
         |    THEN ${graft.StableRound.sql6(dEff)} END AS cohens_d
         |FROM m""".stripMargin
    },

    // identical grid/pairing/assembly as the batch entry once the
    // per-day counters materialize ⇒ the oracle IS agg_xcorr's
    "stream_xcorr" -> StatsQueries.oracle("agg_xcorr"),

    // single-batch drain ⇒ per-user chains pair exactly as the batch
    // lead window ⇒ the oracle IS agg_markov_transitions'
    "stream_markov" -> StatsQueries.oracle("agg_markov_transitions"),

    // per-user (first,last) state then the batch KM projection ⇒ the
    // oracle IS agg_survival_km's
    "stream_survival" -> StatsQueries.oracle("agg_survival_km"),

    // per-user (last_day,freq,mon) state then the batch threshold
    // projection ⇒ the oracle IS agg_rfm's
    "stream_rfm" -> StatsQueries.oracle("agg_rfm"),

    // single-pass stream over the full corpus ≡ the per-day batch
    // two-proportion collapse; mirrored pooled-z straight line
    "stream_two_prop" -> {
      val pa = "(CAST(xa AS DOUBLE) / CAST(na AS DOUBLE))"
      val pb = "(CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))"
      val pp = "((CAST(xa AS DOUBLE) + CAST(xb AS DOUBLE)) " +
        "/ (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))"
      s"""WITH v AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
         |      AS day_start,
         |    user_id % 2 = 0 AS isa,
         |    event_type = 'purchase' AS conv FROM events),
         |m AS (SELECT day_start,
         |    sum(CASE WHEN isa THEN 1 ELSE 0 END) AS na,
         |    sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS nb,
         |    sum(CASE WHEN isa AND conv THEN 1 ELSE 0 END) AS xa,
         |    sum(CASE WHEN NOT isa AND conv THEN 1 ELSE 0 END) AS xb
         |  FROM v GROUP BY 1)
         |SELECT day_start, CAST(na AS BIGINT) AS n_a,
         |  CAST(nb AS BIGINT) AS n_b, CAST(xa AS BIGINT) AS x_a,
         |  CAST(xb AS BIGINT) AS x_b,
         |  CASE WHEN na > 0 AND nb > 0 AND $pp > 0 AND $pp < 1
         |    THEN ${graft.StableRound.sql6(
              s"($pa - $pb) / sqrt($pp * (1.0 - $pp) " +
                "* (1.0 / CAST(na AS DOUBLE) " +
                "+ 1.0 / CAST(nb AS DOUBLE)))")}
         |    END AS z
         |FROM m""".stripMargin
    },
  )
}
