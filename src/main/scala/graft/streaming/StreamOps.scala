package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.sink.JdbcSink

/** Structured Streaming tier (SURVEY §2.9; north star "Structured
  * Streaming ingestion + JDBC sink").
  *
  * The reference's "stream" is a filesystem queue (`datapump.py:694-707`);
  * here it becomes a real file-source stream with archive-on-completion
  * (`cleanSource=archive` ≙ move-to-processed), watermarked event-time
  * windows, stateful streaming dedupe, and a per-micro-batch JDBC upsert
  * (`foreachBatch` → JdbcSink.upsert) — the canonical streaming-upsert
  * pattern.
  */
object StreamOps {

  private val nameCounter = new AtomicLong(0)

  /** Guards the shuffle-partition save/set/restore window below: the conf
    * is session-global, so two overlapping scoped calls would race on it
    * (set A, set B, restore A's saved value, restore B's saved value =
    * B's temporary). Serializing the window makes the mutation safe for
    * concurrent graft callers; OTHER queries the application runs on the
    * same SparkSession during the window still observe the temporary
    * value — callers needing full isolation should use a separate
    * SparkSession (`spark.newSession()` shares the state stores but not
    * the conf). */
  private val confLock = new Object

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n` (the streaming state-store count at FIRST query start — baked
    * into the checkpoint for the query's life). Serialized via
    * [[confLock]]; see its scaladoc for the isolation contract. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    confLock.synchronized {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

  /** CSV file-source stream over a directory, with the reference's archive
    * semantics: processed files are moved to `archiveDir` (cleanSource),
    * the streaming twin of the processed/ queue move. */
  def fileStreamCsv(spark: SparkSession, dir: String, schema: StructType,
      archiveDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream
      .schema(schema)
      .option("header", true)
      .option("nullValue", "")
    archiveDir.foreach { a =>
      r = r.option("cleanSource", "archive").option("sourceArchiveDir", a)
    }
    maxFilesPerTrigger.foreach(m => r = r.option("maxFilesPerTrigger", m))
    r.csv(dir)
  }

  /** Parquet file-source stream with a fixed schema. NOTE: the file source
    * requires a directory or a GLOB — a literal single-file path fails
    * basePath validation, so to stream one file use a glob that matches it
    * (e.g. `dir/events.parque*`). */
  def fileStreamParquet(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling event-time window aggregation. */
  def tumbling(events: DataFrame, tsCol: String, dur: String,
      keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    events.groupBy(
      (keys.map(col) :+ window(col(tsCol), dur)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window aggregation. */
  def sliding(events: DataFrame, tsCol: String, dur: String, slide: String,
      keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    events.groupBy(
      (keys.map(col) :+ window(col(tsCol), dur, slide)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window (gap-based) aggregation. */
  def session(events: DataFrame, tsCol: String, gap: String,
      keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    events.groupBy(
      (keys.map(col) :+ session_window(col(tsCol), gap)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** The default (HDFS-backed, on-heap) state store provider. */
  val HdfsStateStore: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** RocksDB state store provider (ships with Spark + rocksdbjni): state
    * lives off-heap/on-disk per store instead of as JVM objects — the
    * scale choice once streaming keyspaces outgrow executor heap
    * (dedupe/session state over 100 TB event streams). Same exactly-once
    * semantics; changelog/snapshot files still go to the checkpoint
    * location. */
  val RocksDbStateStore: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the given state-store provider class scoped in (and
    * the previous value restored after), serialized on the same lock as
    * the partition override — the provider conf is read at query START
    * and then pinned by the query, so the scope only needs to cover
    * `start()`. */
  def withStateStore[T](spark: SparkSession, providerClass: String)(
      body: => T): T =
    confLock.synchronized {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.get(key, HdfsStateStore)
      spark.conf.set(key, providerClass)
      try body finally spark.conf.set(key, prev)
    }

  /** Run a (bounded) streaming DataFrame to completion with AvailableNow
    * into a memory sink and return the materialized result — used by the
    * driver-checkable stream queries and batch-parity tests.
    *
    * State partitioning: the shuffle-partition count at FIRST start
    * becomes the query's state-store count for life (it is baked into the
    * checkpoint). These bounded runs use a small count — 32 state stores
    * per micro-batch is pure per-instance overhead here (measured 2× on
    * the windowed queries); production sizing belongs to the deployment's
    * key cardinality, not this default.
    *
    * `stateStore`: state-store provider class for stateful operators —
    * [[HdfsStateStore]] (default; state as on-heap JVM objects) or
    * [[RocksDbStateStore]] (off-heap/on-disk; the 100 TB-keyspace
    * choice). Results are provider-independent (StreamingSpec asserts
    * it); only memory residence and checkpoint file layout change. */
  def runToMemory(df: DataFrame, outputMode: String,
      statePartitions: Int = 8,
      stateStore: String = HdfsStateStore): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    // the lock scopes only save/set + start() — both confs are pinned at
    // query START, so execution runs outside the lock and a slow or hung
    // query cannot block other graft streaming callers
    val q = withStatePartitions(spark, statePartitions) {
      withStateStore(spark, stateStore) {
        df.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(outputMode)
          .trigger(Trigger.AvailableNow())
          .start()
      }
    }
    q.awaitTermination()
    spark.table(name)
  }

  /** Per-key running aggregate via CUSTOM STATE (flatMapGroupsWithState) —
    * the API for stateful logic that windows/dropDuplicates can't express
    * (running counters, custom sessionization, CDC-style merge). State is
    * one (count, max) pair per key, persisted in the state store across
    * micro-batches; each batch emits the key's updated running totals.
    * NoTimeout: the keyspace here (users) is bounded; unbounded keyspaces
    * pair this with event-time timeouts to bound the store. */
  def statefulUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[(Long, Long)]) =>
          var (n, m) = state.getOption.getOrElse((0L, Long.MinValue))
          rows.foreach { r => n += 1; if (r._2 > m) m = r._2 }
          state.update((n, m))
          Iterator((uid, n, m))
      }
      .toDF("user_id", "n_events", "max_event_id")
  }

  /** Bounded-state streaming top-k per (event_type, hour bucket): the
    * state store carries AT MOST k (value_cents, event_id) pairs per key
    * — the leaderboard primitive whose state does NOT grow with the
    * window's row count (a collect_list-based top-k would). Each batch
    * folds its rows into the k-bounded buffer and re-emits the current
    * leaderboard; ordering is (cents DESC, event_id ASC), a total order,
    * so ranks are deterministic. Across micro-batches the rank-r entry
    * is monotone non-decreasing under struct(cents, -event_id) (the
    * candidate multiset only grows), so a batch-side max-per-rank
    * projection collapses replayed emissions exactly — see the
    * stream_topk query. */
  def statefulTopK(events: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"),
        date_trunc("hour", col("ts")).as("bucket_start"),
        round(col("value") * 100).cast("long").as("c"),
        col("event_id").cast("long"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Long)],
          (String, java.sql.Timestamp, Int, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((et, bucket), rows, state: GroupState[List[(Long, Long)]]) =>
          val incoming = rows.map(r => (r._3, r._4)).toList
          val buf = (state.getOption.getOrElse(Nil) ++ incoming)
            .sortBy { case (c, id) => (-c, id) }.take(k)
          state.update(buf)
          buf.iterator.zipWithIndex.map { case ((c, id), i) =>
            (et, bucket, i + 1, c, id)
          }
      }
      .toDF("event_type", "bucket_start", "rk", "value_cents", "event_id")
  }

  /** Per-user EVENT TRANSITIONS via custom state — the streaming feed
    * for a live Markov transition matrix: state is ONE (ts, event_id,
    * type) triple per user (the last event seen), each batch sorts its
    * per-user slice by (ts, event_id), chains it onto the remembered
    * last event, and emits the (cur, nxt) pairs; the state store never
    * grows past one row per user. Exactness contract: transitions pair
    * correctly when a user's events arrive in event-time order ACROSS
    * batches (within a batch any order is fine — the slice is sorted);
    * an ordered log or a single-batch drain satisfies it. */
  def statefulTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Int, Long, String),
          (String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[(Long, Int, Long, String)]) =>
          // (ms, nanos, event_id) is the full event-time order — ms
          // alone would drop the microsecond digits the corpus carries
          val sorted = rows.toSeq
            .sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
          val chain = state.getOption.map(_._4).toSeq ++
            sorted.map(_._4)
          val last = sorted.last
          state.update((last._2.getTime, last._2.getNanos, last._3,
            last._4))
          chain.sliding(2).collect { case Seq(a, b) => (a, b) }
      }
      .toDF("cur", "nxt")
  }

  /** Custom gap-timeout sessionization via flatMapGroupsWithState +
    * EVENT-TIME TIMEOUT — the state-TTL mechanism: a session's state
    * carries (start, end, count) and registers a timeout at
    * lastEvent + gap; when the WATERMARK passes that instant the state
    * times out, the closed session is EMITTED and the state REMOVED —
    * so the store never accumulates dead sessions (the unbounded-keyspace
    * safety `session_window` gets for free, here in the custom-state
    * form). Batch-granular: events arriving in one micro-batch fold into
    * one open session (gap splitting happens on watermark passage).
    * Returns (user_id, session_start, session_end, n_events) per CLOSED
    * session. */
  def sessionizeWithTimeout(events: DataFrame, userCol: String,
      tsCol: String, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      // project/cast BEFORE the watermark: a cast after it mints a new
      // attribute without the event-time tag and EventTimeTimeout rejects
      // the query
      .select(col(userCol).cast("long").as("__u"),
        col(tsCol).cast("timestamp").as("__t"))
      .withWatermark("__t", s"$gapMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
        (Long, java.sql.Timestamp, java.sql.Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s0, e0, n0) = state.get
            state.remove()
            Iterator((uid, new java.sql.Timestamp(s0),
              new java.sql.Timestamp(e0), n0))
          } else {
            val ts = rows.map(_._2.getTime).toSeq
            val (s0, e0, n0) =
              state.getOption.getOrElse((Long.MaxValue, Long.MinValue, 0L))
            val merged =
              (math.min(s0, ts.min), math.max(e0, ts.max), n0 + ts.size)
            state.update(merged)
            // close when the watermark passes lastEvent + gap
            state.setTimeoutTimestamp(merged._2 + gapMs)
            Iterator.empty
          }
      }
      .toDF("user_id", "session_start", "session_end", "n_events")
  }

  /** Watermarked stream-stream INTERVAL join — the click-attribution /
    * impression-conversion shape: match right-side events to left-side
    * events of the same key within `[leftTs, leftTs + windowMinutes]`.
    * Both sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can evict joined state once the watermark passes
    * (without the bound, stream-stream join state grows forever — the
    * 100 TB failure mode). Inner join (default): a match emits exactly
    * once, when both sides have arrived. `leftOuter`: additionally, a
    * left row with NO match emits once with null right columns — but
    * only after the watermark passes the end of its match window
    * (before that a match could still arrive), so unmatched results are
    * watermark-delayed by construction. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, windowMinutes: Int,
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right
      .withColumnRenamed(keyCol, s"__r_$keyCol")
      .withWatermark(rightTsCol, watermark)
    l.join(r,
      col(keyCol) === col(s"__r_$keyCol") &&
        col(rightTsCol) >= col(leftTsCol) &&
        col(rightTsCol) <=
          col(leftTsCol) + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .drop(s"__r_$keyCol")
  }

  /** Partition ids present under a `__batch_id=`-partitioned root (empty
    * if the root does not exist yet). Pure FS listing — no data read. */
  private def prefixedIds(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, prefix: String): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(prefix).toLong).toOption)
      .toSeq

  private def batchPartitionIds(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    prefixedIds(fs, root, "__batch_id=")

  /** One micro-batch of the streaming incremental dedupe — REPLAY-
    * IDEMPOTENT. foreachBatch gives at-least-once execution: a batch
    * whose epoch did not commit to the checkpoint is re-run with the
    * SAME `batchId` and the SAME input rows. Appending (the naive form)
    * lands the replayed survivors twice; flipping the append order only
    * trades the duplicate for silent loss. Instead both sinks are
    * partitioned by `__batch_id` and written with DYNAMIC partition
    * overwrite, so an attempt — first or replayed — overwrites exactly
    * its own partition and nothing else:
    *   - the anti-join reads the key table EXCLUDING the current
    *     batch's partition (partition-pruned), so a replay whose first
    *     attempt already wrote its keys recomputes the same survivor
    *     set rather than seeing its own keys and emptying the batch
    *     (which would then overwrite good output with nothing);
    *   - partitions `!= batchId` are immutable at batch start (epoch
    *     N-1 commits before N runs), so the recomputation is
    *     deterministic.
    *
    * KEY-TABLE COMPACTION (bounded listing cost): each batch adds one
    * partition to `keyDir`; at steady state the anti-join's file
    * listing would grow without bound. When more than `compactAfter`
    * non-current partitions exist, they are folded into a single
    * GENERATION partition `__batch_id = -(batchId + 2)` (unique per
    * epoch, never colliding with real batch ids) and the source
    * partitions are deleted. Crash-safety of the fold: the write is
    * APPEND (duplicate keys are harmless to an anti-join, lost keys are
    * not), so a replay that re-folds after a partial source delete can
    * only re-append a subset that the generation already holds — the
    * key SET never shrinks. */
  def incrementalDedupeBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, keyDir: String, outDir: String,
      compactAfter: Int = 16): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    val keyed = batch
      .withColumn("n_len", length(norm))
      .withColumn("n_fp", graft.ops.TextOps.fingerprint(norm))
    val firstInBatch = keyed
      .withColumn("__rk", row_number().over(
        Window.partitionBy("n_len", "n_fp").orderBy(col(idCol))))
      .filter(col("__rk") === 1).drop("__rk")
    val keyPath = new org.apache.hadoop.fs.Path(keyDir)
    val fs = keyPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // compact BEFORE the anti-join: set-preserving, so a replay that
    // re-runs the fold still anti-joins against the same key set
    val gen = -(batchId + 2)
    val foldable = batchPartitionIds(fs, keyPath)
      .filter(id => id != batchId && id != gen)
    if (compactAfter > 0 && foldable.size > compactAfter) {
      spark.read.parquet(keyDir)
        .filter(col("__batch_id").isin(foldable: _*))
        .select("n_len", "n_fp").distinct()
        .withColumn("__batch_id", lit(gen))
        .write.mode("append").partitionBy("__batch_id").parquet(keyDir)
      foldable.foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(keyPath,
          s"__batch_id=$id"), true)
      }
    }

    // pin the survivors before the two writes (the anti-join must not
    // recompute between them) and RELEASE the cache per batch — a
    // long-running stream must not accumulate block-manager entries.
    // Gate on the partition LIST, not fs.exists: a crash can leave the
    // root with zero partitions (schema inference would fail), and only
    // partitions `!= batchId` may gate a replayed batch's survivors
    val priorKeys = batchPartitionIds(fs, keyPath).filter(_ != batchId)
    val fresh =
      (if (priorKeys.nonEmpty)
        firstInBatch.join(
          spark.read.parquet(keyDir)
            .filter(col("__batch_id").isin(priorKeys: _*))
            .select("n_len", "n_fp"),
          Seq("n_len", "n_fp"), "left_anti")
      else firstInBatch).persist()
    try {
      fresh.drop("n_len", "n_fp")
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(outDir)
      fresh.select("n_len", "n_fp")
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(keyDir)
    } finally fresh.unpersist()
  }

  /** Streaming INCREMENTAL ingestion dedupe — the unbounded-history
    * shape `dropDuplicatesWithinWatermark` cannot express: its state
    * store is watermark-scoped, but "never land the same document
    * twice, ever" needs history that outlives any watermark. Per
    * micro-batch: keep-first within the batch (min `idCol` per key),
    * anti-join against the PERSISTENT key table, land survivors in
    * `outDir` and their keys in `keyDir`. Keys are the 16-byte
    * (length, fingerprint) projection of the normalized text — the
    * dedupe_incremental convention: at 100 TB the key table is
    * bloom-filterable/broadcastable while document bodies never
    * shuffle. Replay-idempotence and key-table compaction live in
    * [[incrementalDedupeBatch]] (batchId-partitioned dynamic-overwrite
    * writes — see its scaladoc for the crash-window analysis).
    *
    * NOTE for `outDir` consumers: survivors land under a `__batch_id=N`
    * partition layout, so reads of `outDir` see one extra long column
    * `__batch_id` versus the pre-idempotence flat append sink. Drop it
    * (`.drop("__batch_id")`) if the landing epoch is irrelevant; it is
    * also the natural incremental-consumption cursor. */
  def incrementalDedupeEachBatch(stream: DataFrame, idCol: String,
      textCol: String, keyDir: String, outDir: String, ckptDir: String,
      compactAfter: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalDedupeBatch(batch, batchId, idCol, textCol, keyDir,
          outDir, compactAfter)
      }
      .start()

  /** One micro-batch of the streaming CHUNK-level (block) dedupe — the
    * sub-document twin of [[incrementalDedupeBatch]], gating on the
    * fraction of a doc's disjoint 32-token blocks already OBSERVED on a
    * lower-id doc (landed in a prior batch, or a batch-mate). Law per
    * chunk: duplicated iff min(doc_id) over its tokenHash60 across
    * (prior index ∪ this batch) < doc_id; per doc: keep iff
    * 2·n_dup_chunks < n_chunks — all integer, so for any doc_id-ordered
    * batching the landed verdicts TILE the batch relation (the oracle is
    * the one-shot batch SQL over the whole corpus, shared for any split).
    *
    * Replay-idempotent by the proven construction: verdicts and the
    * (hash, first_doc) index both land partitioned by `__batch_id` with
    * dynamic overwrite, and the cross-batch probe reads partitions
    * `!= batchId` only. Index rows are per-batch minima; the probe takes
    * the min across batches at read time — 8-byte keys, strings never
    * land or shuffle. */
  def chunkDedupeBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, indexDir: String, outDir: String,
      window: Int = 32, compactAfter: Int = 16): Unit = {
    val spark = batch.sparkSession
    val h = graft.ops.TextOps.chunkOverlap(batch, idCol, textCol,
        window = window, stride = window)
      .select(col(idCol),
        graft.ops.TextDedupe.tokenHash60(col("chunk_text")).as("h"))
      .persist()
    try {
      val idxPath = new org.apache.hadoop.fs.Path(indexDir)
      val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // compact BEFORE the probe (incrementalDedupeBatch's discipline):
      // fold old per-batch partitions into one generation partition,
      // keeping min(first_doc) per hash — set-of-minima preserving, so
      // a replay that re-runs the fold still probes the same relation
      val gen = -(batchId + 2)
      val foldable = prefixedIds(fs, idxPath, "__batch_id=")
        .filter(id => id != batchId && id != gen)
      if (compactAfter > 0 && foldable.size > compactAfter) {
        spark.read.parquet(indexDir)
          .filter(col("__batch_id").isin(foldable: _*))
          .groupBy("h").agg(min("first_doc").as("first_doc"))
          .withColumn("__batch_id", lit(gen))
          .write.mode("append").partitionBy("__batch_id").parquet(indexDir)
        foldable.foreach { id =>
          fs.delete(new org.apache.hadoop.fs.Path(idxPath,
            s"__batch_id=$id"), true)
        }
      }
      val prior = prefixedIds(fs, idxPath, "__batch_id=")
        .filter(_ != batchId)
      val batchMin = h.groupBy("h").agg(min(col(idCol)).as("bm"))
      val withPrior =
        if (prior.isEmpty) batchMin.withColumn("pm", lit(null).cast("long"))
        else batchMin.join(
          spark.read.parquet(indexDir)
            .filter(col("__batch_id").isin(prior: _*))
            .groupBy("h").agg(min("first_doc").as("pm")),
          Seq("h"), "left")
      val verdicts = h.join(withPrior, "h")
        .withColumn("__dup",
          least(col("bm"), coalesce(col("pm"), col("bm"))) < col(idCol))
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("__dup"), 1)).as("n_dup_chunks"))
        .withColumn("keep", col("n_dup_chunks") * 2 < col("n_chunks"))
      verdicts.withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(outDir)
      batchMin.select(col("h"), col("bm").as("first_doc"))
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(indexDir)
    } finally h.unpersist()
  }

  def chunkDedupeEachBatch(stream: DataFrame, idCol: String,
      textCol: String, indexDir: String, outDir: String, ckptDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        chunkDedupeBatch(batch, batchId, idCol, textCol, indexDir, outDir)
      }
      .start()

  /** One micro-batch of the streaming NEAR-DUP dedupe — the MinHash
    * tier of [[incrementalDedupeBatch]] (which gates on exact
    * normalized-text keys; this gates on verified Jaccard ≥
    * `threshold`). Per batch:
    *
    *   1. band the batch (`TextDedupe.bandRows` — the SAME banding as
    *      `dedupe_minhash_lsh`, so the tiers cannot drift);
    *   2. candidates = band-bucket matches WITHIN the batch
    *      (lower id gates higher — all-prior convention) plus matches
    *      against the PERSISTENT band table (only LANDED docs gate
    *      across batches — a dropped doc's bands never land);
    *   3. exact-Jaccard verification joins candidate texts back: the
    *      batch side from the batch, the history side from `outDir`
    *      pruned to candidate ids (the id-pushed rerank pattern — band
    *      buckets bound the history reads, never a corpus scan);
    *   4. survivors land in `outDir`, their band rows in `bandDir`,
    *      both `__batch_id`-partitioned with dynamic overwrite — the
    *      replay-idempotence construction of [[incrementalDedupeBatch]]
    *      (see its scaladoc for the crash-window analysis); the band
    *      table folds into a generation partition past `compactAfter`
    *      (same set-preserving append-then-delete fold).
    *
    * Scale shape: band rows are (id, 2×long) — the corpus never
    * shuffles; history text is read only for verified band-candidates.
    * Docs under 3 tokens carry no shingle, hence no bands: they always
    * land (matching the batch tier). */
  def neardupDedupeBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, bandDir: String, outDir: String,
      threshold: Double = 0.5, compactAfter: Int = 16): Unit = {
    val spark = batch.sparkSession
    val bandPath = new org.apache.hadoop.fs.Path(bandDir)
    val fs = bandPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val bands = graft.ops.TextDedupe.bandRows(batch, idCol, textCol)
      .persist() // feeds intra-batch self-join, history join, and landing

    try {
      // intra-batch: lower id gates higher (all-prior, deterministic)
      val a = bands.select(col(idCol).as("d1"), col("band"), col("band_sig"))
      val b = bands.select(col(idCol).as("d2"), col("band"), col("band_sig"))
      val candIntra = a.join(b, Seq("band", "band_sig"))
        .filter(col("d1") < col("d2")).select("d1", "d2").distinct()
      val droppedIntra = graft.ops.TextDedupe
        .verifyJaccard(candIntra, batch, batch, idCol, textCol, threshold)
        .select(col("d2").as(idCol))

      // history: fold old partitions first (set-preserving, replay-safe)
      val gen = -(batchId + 2)
      val foldable = batchPartitionIds(fs, bandPath)
        .filter(id => id != batchId && id != gen)
      if (compactAfter > 0 && foldable.size > compactAfter) {
        spark.read.parquet(bandDir)
          .filter(col("__batch_id").isin(foldable: _*))
          .select(idCol, "band", "band_sig").distinct()
          .withColumn("__batch_id", lit(gen))
          .write.mode("append").partitionBy("__batch_id").parquet(bandDir)
        foldable.foreach { id =>
          fs.delete(new org.apache.hadoop.fs.Path(bandPath,
            s"__batch_id=$id"), true)
        }
      }
      val priorParts = batchPartitionIds(fs, bandPath).filter(_ != batchId)
      val droppedHist = if (priorParts.isEmpty) droppedIntra.limit(0)
      else {
        val prior = spark.read.parquet(bandDir)
          .filter(col("__batch_id").isin(priorParts: _*))
          .select(col(idCol).as("d1"), col("band"), col("band_sig"))
        val candHist = bands
          .select(col(idCol).as("d2"), col("band"), col("band_sig"))
          .join(prior, Seq("band", "band_sig"))
          .select("d1", "d2").distinct()
        val histDocs = spark.read.parquet(outDir)
          .select(col(idCol), col(textCol))
          .join(candHist.select(col("d1").as(idCol)).distinct(), idCol)
        graft.ops.TextDedupe.verifyJaccard(
            candHist, histDocs, batch, idCol, textCol, threshold)
          .select(col("d2").as(idCol))
      }

      val survivors = batch
        .join(droppedIntra.union(droppedHist).distinct(),
          Seq(idCol), "left_anti")
        .persist() // pin before the two idempotent writes
      try {
        survivors
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(outDir)
        graft.ops.TextDedupe.bandRows(survivors, idCol, textCol)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(bandDir)
      } finally survivors.unpersist()
    } finally bands.unpersist()
  }

  /** Streaming incremental NEAR-DUP dedupe: never land a document whose
    * verified Jaccard against anything already landed (or a lower-id
    * batch-mate) reaches the threshold — unbounded history, beyond any
    * watermark, same contract shape as [[incrementalDedupeEachBatch]]
    * but on the MinHash-LSH near-dup relation instead of exact keys.
    * `outDir` consumers: survivors carry a `__batch_id` partition
    * column (drop it if the landing epoch is irrelevant). */
  def neardupDedupeEachBatch(stream: DataFrame, idCol: String,
      textCol: String, bandDir: String, outDir: String, ckptDir: String,
      threshold: Double = 0.5, compactAfter: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        neardupDedupeBatch(batch, batchId, idCol, textCol, bandDir,
          outDir, threshold, compactAfter)
      }
      .start()

  /** One micro-batch of the streaming incremental SEMANTIC (embedding)
    * dedupe — the vector tier of [[incrementalDedupeBatch]] /
    * [[neardupDedupeBatch]], same replay-idempotence construction
    * (`__batch_id` dynamic partition overwrite on both sinks):
    *
    *   1. quantizer STABILITY: centroids train once — on the first
    *      batch — and persist beside the cell table; later batches (and
    *      replays) reload them, so cell ids mean the same thing in every
    *      epoch. A replayed batch 0 retrains deterministically (seeded
    *      sample, identical input) and idempotently overwrites.
    *   2. candidates = cell matches WITHIN the batch (lower id gates
    *      higher — the all-prior convention) plus matches against the
    *      PERSISTENT (id, cell) table of LANDED vectors;
    *   3. exact-cosine verification joins candidate vectors back — the
    *      history side from `outDir` pruned to candidate ids, so cell
    *      buckets bound the history reads, never a corpus scan;
    *   4. survivors land in `outDir`, their cell rows in `cellDir`,
    *      both `__batch_id`-partitioned with dynamic overwrite; the
    *      cell table folds into a generation partition past
    *      `compactAfter` (the set-preserving append-then-delete fold).
    *
    * Scale shape: cell rows are (id, int) — vectors shuffle only inside
    * the batch and as id-pruned history reads; per-batch cost is
    * |batch|·cell-candidates, never |batch|×|corpus|. */
  def embedDedupeBatch(batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String, cellDir: String, outDir: String,
      threshold: Double = 0.9, nCentroids: Int = 16, nAssign: Int = 6,
      compactAfter: Int = 16): Unit = {
    import graft.ops.VectorOps
    val spark = batch.sparkSession
    val cellPath = new org.apache.hadoop.fs.Path(cellDir)
    val fs = cellPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val centDir = cellDir.stripSuffix("/") + "_centroids"
    val centroids: Array[Array[Float]] =
      if (fs.exists(new org.apache.hadoop.fs.Path(centDir))) {
        spark.read.parquet(centDir).orderBy("cell")
          .select("vec").collect().map(_.getSeq[Float](0).toArray)
      } else {
        val sample = VectorOps.sampleUnitVectors(batch, vecCol, 4096, 42L)
        val cs = VectorOps.ivfTrainOnSample(sample,
          math.min(nCentroids, sample.length))
        import spark.implicits._
        cs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("cell", "vec")
          .write.mode("overwrite").parquet(centDir)
        cs
      }
    val cells = VectorOps.multiAssign(batch, vecCol, centroids, nAssign)
      .select(col(idCol), col("__cell"))
      .persist() // feeds intra-batch join, history join, and landing
    try {
      val a = cells.select(col(idCol).as("d1"), col("__cell"))
      val b = cells.select(col(idCol).as("d2"), col("__cell"))
      val candIntra = a.join(b, Seq("__cell"))
        .filter(col("d1") < col("d2")).select("d1", "d2").distinct()
      val droppedIntra = VectorOps.verifyCosine(candIntra, batch, batch,
        idCol, vecCol, threshold).select(col("d2").as(idCol))

      // fold old cell partitions first (set-preserving, replay-safe)
      val gen = -(batchId + 2)
      val foldable = batchPartitionIds(fs, cellPath)
        .filter(id => id != batchId && id != gen)
      if (compactAfter > 0 && foldable.size > compactAfter) {
        spark.read.parquet(cellDir)
          .filter(col("__batch_id").isin(foldable: _*))
          .select(idCol, "__cell").distinct()
          .withColumn("__batch_id", lit(gen))
          .write.mode("append").partitionBy("__batch_id").parquet(cellDir)
        foldable.foreach { id =>
          fs.delete(new org.apache.hadoop.fs.Path(cellPath,
            s"__batch_id=$id"), true)
        }
      }
      val priorParts = batchPartitionIds(fs, cellPath).filter(_ != batchId)
      val droppedHist = if (priorParts.isEmpty) droppedIntra.limit(0)
      else {
        val prior = spark.read.parquet(cellDir)
          .filter(col("__batch_id").isin(priorParts: _*))
          .select(col(idCol).as("d1"), col("__cell"))
        val candHist = cells.select(col(idCol).as("d2"), col("__cell"))
          .join(prior, Seq("__cell")).select("d1", "d2").distinct()
        val histVecs = spark.read.parquet(outDir)
          .select(col(idCol), col(vecCol))
          .join(candHist.select(col("d1").as(idCol)).distinct(), idCol)
        VectorOps.verifyCosine(candHist, histVecs, batch,
          idCol, vecCol, threshold).select(col("d2").as(idCol))
      }

      val survivors = batch
        .join(droppedIntra.union(droppedHist).distinct(),
          Seq(idCol), "left_anti")
        .persist() // pin before the two idempotent writes
      try {
        survivors
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(outDir)
        VectorOps.multiAssign(survivors, vecCol, centroids, nAssign)
          .select(col(idCol), col("__cell"))
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(cellDir)
      } finally survivors.unpersist()
    } finally cells.unpersist()
  }

  /** Streaming incremental SEMANTIC dedupe: never land an embedding
    * whose verified cosine against anything already landed (or a
    * lower-id batch member) meets `threshold` — same contract shape as
    * [[neardupDedupeEachBatch]] on the IVF-cell relation instead of
    * MinHash bands. */
  def embedDedupeEachBatch(stream: DataFrame, idCol: String,
      vecCol: String, cellDir: String, outDir: String, ckptDir: String,
      threshold: Double = 0.9, nCentroids: Int = 16, nAssign: Int = 6,
      compactAfter: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        embedDedupeBatch(batch, batchId, idCol, vecCol, cellDir,
          outDir, threshold, nCentroids, nAssign, compactAfter)
      }
      .start()

  /** Landed same-cell candidates for one streaming-SemDeDup batch: the
    * (cell, __batch_id)-partitioned layout filtered to the batch's own
    * cells AND to STRICTLY EARLIER batches. Both predicates resolve
    * against partition directories (PartitionFilters — gated in
    * StreamingSpec on this frame, the eager-stage twin of the
    * vec_ann_ivfpq note in PlanAudit.expectedShapes), so a batch reads
    * only the cells it probes, never the corpus. The earlier-batch
    * bound is the replay story: a crash-replayed batch recomputes its
    * original pair set even after later batches landed. */
  def semdedupLanded(spark: SparkSession, layoutDir: String,
      idCol: String, vecCol: String, cells: Seq[Long],
      batchId: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(layoutDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(layoutDir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(vecCol,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.LongType))))
    spark.read.parquet(layoutDir)
      .filter(col("cell").isin(cells: _*) && col("__batch_id") < batchId)
      .select(col(idCol), col(vecCol), col("cell").cast("long").as("cell"))
  }

  /** One micro-batch of the STREAMING SemDeDup tier — the streaming
    * posture of `dedupe_embed_semdedup`: cells come from a FROZEN
    * persisted quantizer RELATION
    * ([[graft.ops.VectorOps.semdedupQuantizer]] — the pre-update
    * final-round Lloyd centroids as a k-row (cid, c) table, assigned
    * two-level via [[graft.ops.VectorOps.semdedupAssignFrozen]], so
    * each vector lands in exactly the cell the batch tier assigns it,
    * independent of batching, and the model is never collected or
    * baked into an expression literal — k scales with the corpus),
    * candidates are (earlier-batch landed ∪ batch mates)
    * restricted to the SAME cell, and the exact-cosine verify uses the
    * batch tier's expression verbatim. The union of per-batch pair sets
    * over any batching of the corpus — including the one-batch replay a
    * fresh checkpoint produces — is the batch tier's same-cell pair
    * relation EXACTLY, which is why the entry shares the batch tier's
    * Lloyd-replay oracle. Pairs land under `__batch_id=N` and vectors
    * under `cell=K/__batch_id=N`, both dynamic-overwrite idempotent. */
  def semdedupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, quant: DataFrame,
      threshold: Double, layoutDir: String, pairsDir: String): Unit = {
    import graft.ops.VectorOps
    val cells = VectorOps.semdedupAssignFrozen(batch, idCol, vecCol,
      quant, nAssign = 1)
    val bx = VectorOps.withNorm(
        batch.select(col(idCol).cast("long").as(idCol), col(vecCol)), vecCol)
      .join(cells, idCol)
      .persist()
    try {
      // the probe list is bounded by k (cells, not vectors)
      val batchCells = bx.select("cell").distinct()
        .collect().map(_.getLong(0)).toSeq
      val lx = VectorOps.withNorm(
        semdedupLanded(spark, layoutDir, idCol, vecCol, batchCells,
          batchId), vecCol)
      val b = bx.select(col(idCol).as("bid"), col(vecCol).as("bv"),
        col("__norm").as("bn"), col("cell"))
      val l = lx.select(col(idCol).as("lid"), col(vecCol).as("lv"),
        col("__norm").as("ln"), col("cell"))
      val cross = b.join(l, "cell")
        .filter(VectorOps.dot(col("bv"), col("lv"))
          / (col("bn") * col("ln")) >= threshold)
        .select(least(col("bid"), col("lid")).as("id1"),
          greatest(col("bid"), col("lid")).as("id2"))
      val a2 = bx.select(col(idCol).as("id2"), col(vecCol).as("v2"),
        col("__norm").as("n2"), col("cell").as("cell2"))
      val mates = b.join(a2, col("cell") === col("cell2")
          && col("bid") < col("id2"))
        .filter(VectorOps.dot(col("bv"), col("v2"))
          / (col("bn") * col("n2")) >= threshold)
        .select(col("bid").as("id1"), col("id2"))
      cross.union(mates)
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id").parquet(pairsDir)
      bx.select(col(idCol), col(vecCol), col("cell"))
        .withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "__batch_id").parquet(layoutDir)
    } finally bx.unpersist()
  }

  /** Streaming SemDeDup driver: [[semdedupBatch]] per micro-batch under
    * AvailableNow (see that method for the replay/oracle contract). */
  def semdedupEachBatch(stream: DataFrame, idCol: String, vecCol: String,
      quant: DataFrame, threshold: Double,
      layoutDir: String, pairsDir: String, ckptDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        semdedupBatch(spark, batch, batchId, idCol, vecCol, quant,
          threshold, layoutDir, pairsDir)
      }
      .start()
  }

  /** Streaming SEQUENCE PACKING — the incremental twin of
    * `CorpusOps.packSequences`: continuous ingestion keeps APPENDING to
    * each group's contiguous token stream (concat-then-chunk layout)
    * without ever re-packing history — the property a training-data
    * service needs, and one no window function can express (the offset
    * must survive across micro-batches).
    *
    * State = ONE LONG per group (the next write offset) — the minimal
    * possible state store; it never grows with document count, only
    * with group cardinality (domains/languages: bounded). Within a
    * micro-batch each group's docs pack in id order (deterministic);
    * across batches they pack in ARRIVAL order starting at the saved
    * offset — by design: re-sorting against history would mean
    * re-packing it. A single AvailableNow pass over a static corpus
    * therefore reproduces the batch layout exactly (one batch ⇒ the
    * in-batch id sort IS the global sort — the oracle checks this);
    * multi-epoch continuation is pinned by StreamingSpec.
    *
    * The per-group-per-batch `toSeq` is bounded by the micro-batch,
    * not the corpus. NoTimeout: group keyspace is bounded by design. */
  def packSequencesStream(docs: DataFrame, idCol: String,
      groupCol: String, textCol: String,
      budgetTokens: Int = 2048): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val budget = budgetTokens.toLong
    docs.select(col(idCol).cast("long").as("__id"),
        col(groupCol).cast("string").as("__g"),
        size(split(col(textCol), " ")).cast("long").as("__n"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (g, rows, state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, n) =>
            val o = off; off += n; (id, g, n, o, o / budget)
          }
          state.update(off)
          out.iterator
      }
      .toDF(idCol, groupCol, "n_tokens", "start_offset", "bin_id")
  }

  /** Per-micro-batch CDC apply — stream_cdc_apply: maintain a keyed
    * snapshot table under an I/U/D change stream. Each batch is
    * collapsed to its LATEST change per key (by `orderCols` desc —
    * the same pick as [[graft.sink.SinkOps.cdcApply]]), then upserts
    * land via the PK upsert and deletes via PK delete. Sequential
    * batches compose to the global latest-change-wins state whenever
    * the change order respects arrival order (a CDC log's contract);
    * foreachBatch replays re-apply the SAME collapsed image — upsert
    * and delete-by-PK are both idempotent, so at-least-once execution
    * converges to the committed state with no __batch_id machinery.
    *
    * Scale shape: per batch, one window shuffle over the CHANGE BATCH
    * only (normally tiny) — the accumulated snapshot is never read,
    * rewritten, or shuffled; the sink applies point writes. */
  def cdcApplyEachBatch(stream: DataFrame, sink: JdbcSink, table: String,
      pk: Seq[String], orderCols: Seq[String], opCol: String = "op",
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(pk.map(col): _*)
          .orderBy(orderCols.map(c => col(c).desc): _*)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .drop(orderCols: _*)
          .persist()
        try {
          val upserts = latest.filter(col(opCol) =!= "D").drop(opCol)
          sink.ensureTable(table, upserts.schema, pk)
          sink.upsert(upserts, table, pk)
          sink.delete(latest.filter(col(opCol) === "D")
            .select(pk.head, pk.tail: _*), table, pk)
        } finally latest.unpersist()
      }
      .start()
  }

  /** Streaming SCD TYPE-2 dimension maintenance — stream_scd2: an
    * attribute-update stream keeps a versioned dimension current with
    * full history, applying [[graft.sink.SinkOps.scd2Merge]] per
    * micro-batch. The dimension is stored SPLIT BY LIVENESS, which is
    * what makes the per-batch cost independent of history size:
    *
    *   - `dimDir/closed/` — closed versions, an APPEND-ONLY log
    *     partitioned by `__batch_id` and written with dynamic partition
    *     overwrite: a replayed batch rewrites exactly its own partition
    *     (the incremental-dedupe construction). Closed versions are
    *     immutable, so they are never read back by the merge at all.
    *   - `dimDir/current/__gen=N/` — the open versions as of batch N, a
    *     GENERATION SWAP: batch N reads the newest generation older
    *     than N, writes generation N, then retires everything older
    *     than the one it read. A replay of batch N still finds its
    *     input generation (it is only deleted once batch N+1 — which
    *     proves N committed — runs) and overwrite-rewrites gen N
    *     deterministically.
    *
    * Per batch the merge touches ONLY open versions (one row per live
    * key) + the update batch — never the closed log, never the stream
    * history. At 100 TB of accumulated history the batch cost is
    * |live keys| + |batch|, and the closed log is append-only cold
    * storage. Precondition: at most one update row per key per
    * micro-batch (pre-collapse with a cdcApply-style latest-pick if the
    * source can emit more).
    *
    * `effectiveTsFor(batchId)` stamps each batch's version boundaries —
    * deterministic per batch id, so replays mint identical rows. */
  def scd2EachBatch(updates: DataFrame, keyCols: Seq[String],
      trackedCols: Seq[String], dimDir: String,
      effectiveTsFor: Long => Column,
      checkpoint: Option[String] = None,
      compactAfter: Int = 16): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = updates.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val curRoot = new org.apache.hadoop.fs.Path(s"$dimDir/current")
        val fs = curRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val gens = prefixedIds(fs, curRoot, "__gen=")
        // read the newest COMMITTED predecessor: a partial generation
        // (crash mid-write, no _SUCCESS) must be invisible to the merge
        val readGen = gens.filter(g => g < batchId &&
          fs.exists(new org.apache.hadoop.fs.Path(curRoot,
            s"__gen=$g/_SUCCESS"))).maxOption
        val current = readGen match {
          case Some(g) => spark.read.parquet(s"$dimDir/current/__gen=$g")
          case None =>
            batch.select((keyCols ++ trackedCols).map(col): _*).limit(0)
              .withColumn("valid_from", lit(null).cast("timestamp"))
              .withColumn("valid_to", lit(null).cast("timestamp"))
              .withColumn("is_current", lit(true))
        }
        val merged = graft.sink.SinkOps.scd2Merge(current,
          batch.select((keyCols ++ trackedCols).map(col): _*),
          keyCols, trackedCols, effectiveTsFor(batchId)).persist()
        try {
          // current held only open rows, so !is_current == closed NOW
          merged.filter(!col("is_current"))
            .withColumn("__batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id").parquet(s"$dimDir/closed")
          merged.filter(col("is_current"))
            .write.mode("overwrite")
            .parquet(s"$dimDir/current/__gen=$batchId")
          gens.filter(g => g < batchId && !readGen.contains(g))
            .foreach { g =>
              fs.delete(new org.apache.hadoop.fs.Path(curRoot,
                s"__gen=$g"), true)
            }
          // CLOSED-LOG COMPACTION (bounded listing cost — the key-table
          // construction): one partition lands per closing batch; past
          // `compactAfter` non-current partitions they are APPENDED into
          // the epoch's generation partition __batch_id = -(batchId+2)
          // and the sources deleted. Append is the crash-safe half
          // (a replayed fold after a partial delete can only re-append
          // rows the generation already holds — the row SET never
          // shrinks); the read side ([[scd2Dim]]) takes distinct() on
          // closed rows, which removes exactly those replay artifacts
          // (closed versions are unique per (key, valid_from) in correct
          // operation).
          val closedRoot = new org.apache.hadoop.fs.Path(s"$dimDir/closed")
          val gen = -(batchId + 2)
          val foldable = batchPartitionIds(fs, closedRoot)
            .filter(id => id != batchId && id != gen)
          if (compactAfter > 0 && foldable.size > compactAfter) {
            spark.read.parquet(s"$dimDir/closed")
              .filter(col("__batch_id").isin(foldable: _*))
              .drop("__batch_id")
              .withColumn("__batch_id", lit(gen))
              .write.mode("append").partitionBy("__batch_id")
              .parquet(s"$dimDir/closed")
            foldable.foreach { id =>
              fs.delete(new org.apache.hadoop.fs.Path(closedRoot,
                s"__batch_id=$id"), true)
            }
          }
        } finally merged.unpersist()
      }
      .start()
  }

  /** Assemble the [[scd2EachBatch]] dimension: newest COMMITTED current
    * generation ∪ all closed partitions (empty-safe on both sides). A
    * crash can leave a partially-written newest generation (files but
    * no _SUCCESS, and the epoch never committed) — readers must fall
    * back to the newest generation whose write completed, which the
    * replay will be reading too. */
  def scd2Dim(spark: SparkSession, dimDir: String): DataFrame = {
    val curRoot = new org.apache.hadoop.fs.Path(s"$dimDir/current")
    val closedRoot = new org.apache.hadoop.fs.Path(s"$dimDir/closed")
    val fs = curRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = prefixedIds(fs, curRoot, "__gen=")
      .filter(g => fs.exists(new org.apache.hadoop.fs.Path(
        curRoot, s"__gen=$g/_SUCCESS")))
      .maxOption
      .getOrElse(throw new IllegalStateException(
        s"no committed current generation under $dimDir/current"))
    val current = spark.read.parquet(s"$dimDir/current/__gen=$gen")
    if (batchPartitionIds(fs, closedRoot).nonEmpty)
      current.unionByName(
        // distinct(): a replayed closed-log fold may have re-appended
        // rows its generation already held (see the compaction note in
        // scd2EachBatch); closed versions are unique per
        // (key, valid_from) in correct operation, so this removes
        // exactly those replay artifacts
        spark.read.parquet(s"$dimDir/closed").drop("__batch_id")
          .distinct())
    else current
  }

  /** Streaming vector ingest into a cell-partitioned IVF layout —
    * stream_vec_ingest: each micro-batch of embeddings is assigned to
    * its nearest coarse centroid (map-only — [[graft.ops.VectorOps.ivfCell]]
    * is a codegen-able projection, no shuffle) and appended under
    * `cell=K/__batch_id=N/`, written with dynamic partition overwrite so
    * a replayed batch rewrites exactly its own (cell, batch) partitions.
    * The ANN index stays queryable throughout: probes read every landed
    * batch under `cell=K/` via partition pruning, so query cost is
    * unchanged by how many increments built the layout. Centroids are
    * FROZEN at stream start (the IVF contract — retraining means
    * re-landing); the batch tier's `ivfQueryLayout` answers queries from
    * the layout either tier wrote. */
  /** Streaming NB classification — stream_classify_nb: micro-batches of
    * documents scored against a FROZEN [[graft.ops.CorpusOps.NbModel]]
    * (trained batch-side — exactly how a production ingest filter runs:
    * the model updates on a slow cadence, the stream never retrains)
    * and landed replay-exact under `__batch_id=N` with dynamic
    * partition overwrite. Stateless per batch — broadcast model joins
    * plus in-batch combinable aggs; no state store, no watermark — so
    * replay idempotence needs only the partition discipline. */
  def classifyEachBatch(stream: DataFrame,
      model: graft.ops.CorpusOps.NbModel, idCol: String, textCol: String,
      labelCol: String, outDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    scoredEachBatch(stream, outDir, checkpoint)(batch =>
      graft.ops.CorpusOps.nbApply(model, batch, idCol, textCol, labelCol))

  /** Streaming DSIR scoring — the deployed posture of
    * [[graft.ops.CorpusOps.dsirWeights]]: the B-row (bucket, score)
    * relation is FROZEN batch-side (the fit artifact a production
    * data-selection filter ships) and every arriving micro-batch is
    * scored statelessly against it via [[graft.ops.CorpusOps.dsirApply]]
    * inside foreachBatch — per-doc token sums are complete within the
    * batch (a document arrives whole), so there is no cross-batch state
    * and replay is idempotent through the dynamic-partition overwrite.
    * One AvailableNow pass over the static corpus reproduces the batch
    * entry exactly. */
  def dsirEachBatch(stream: DataFrame, scores: DataFrame, idCol: String,
      textCol: String, outDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    scoredEachBatch(stream, outDir, checkpoint)(batch =>
      graft.ops.CorpusOps.dsirApply(scores, batch, idCol, textCol))

  /** BM25 scoring in its deployed posture: corpus statistics (query
    * vocabulary df, n_docs/avgdl) are FROZEN batch-side — the index-build
    * cadence — and every arriving micro-batch scores statelessly against
    * the broadcast artifacts (a document arrives whole, so per-doc tf/dl
    * are batch-local). One AvailableNow pass over the static corpus ≡
    * batch TextOps.bm25, sharing its oracle verbatim. */
  def bm25EachBatch(stream: DataFrame, queryTokens: DataFrame,
      dfreq: DataFrame, stats: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    scoredEachBatch(stream, outDir, checkpoint)(batch =>
      graft.ops.TextOps
        .bm25Apply(batch, idCol, textCol, queryTokens, dfreq, stats))

  /** The shared stateless-scoring scaffold behind the frozen-artifact
    * streaming faces (NB classify, DSIR, BM25): one AvailableNow pass,
    * `transform(batch)` per micro-batch, landed replay-exact under
    * `__batch_id=N` with dynamic partition overwrite so a replayed
    * batch rewrites exactly its own partition. */
  private def scoredEachBatch(stream: DataFrame, outDir: String,
      checkpoint: Option[String])(transform: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        transform(batch)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(outDir)
      }
      .start()
  }

  /** One micro-batch of MODEL-VERSIONED classification — the per-batch
    * core of [[classifyVersionedEachBatch]], exposed so replay
    * invariance is directly testable (the established batch-fn
    * pattern). The batch scores under the model generation it FIRST
    * scored under: the binding `modelDir/bindings/batch=N` commits via
    * EXCLUSIVE CREATE on the final path (`fs.create(_, overwrite =
    * false)` throws when the file exists on HDFS and on the local
    * filesystem alike — unlike rename, whose replace-on-collision
    * semantics differ between HDFS and POSIX rename(2)), so exactly one
    * binding ever wins and the loser re-reads the winner's pin; a
    * crash-replayed batch reads its recorded binding and reproduces
    * its original output bit-for-bit even when newer generations have
    * committed since — batches BEFORE a swap and batches AFTER it each
    * keep their own model forever. Output lands replay-exact under
    * `__batch_id=N` with the generation stamped per row. */
  def classifyVersionedBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, modelDir: String, idCol: String,
      textCol: String, labelCol: String, outDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(modelDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val binding = new org.apache.hadoop.fs.Path(
      s"$modelDir/bindings/batch=$batchId")
    val gen: Int =
      if (fs.exists(binding)) {
        val in = fs.open(binding)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      } else {
        val latest = graft.ops.CorpusOps.nbLatestGen(spark, modelDir)
        require(latest >= 0, s"no committed model generation under " +
          s"$modelDir — nbSaveModel one before streaming")
        // exclusive create: on HDFS this is an atomic create-if-absent;
        // on the local fs RawLocalFileSystem.create(overwrite = false)
        // checks-and-throws, which (unlike rename, which POSIX silently
        // replaces) makes the one-winner invariant hold on file:// too
        try {
          val out = fs.create(binding, false)
          try out.write(latest.toString.getBytes("UTF-8"))
          finally out.close()
          latest
        } catch {
          case _: java.io.IOException if fs.exists(binding) =>
            // lost the race to a concurrent replay — honor its pin
            val in = fs.open(binding)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString.trim.toInt
            finally in.close()
        }
      }
    val model = graft.ops.CorpusOps.nbLoadModel(spark, modelDir, gen)
    graft.ops.CorpusOps
      .nbApply(model, batch, idCol, textCol, labelCol)
      .withColumn("model_gen", lit(gen))
      .withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(outDir)
  }

  /** Streaming classification under a RETRAINED-ON-A-CADENCE model —
    * the production upgrade of [[classifyEachBatch]]'s frozen model:
    * each batch resolves the newest committed `modelDir/gen=N`
    * ([[graft.ops.CorpusOps.nbSaveModel]]'s atomic-rename protocol) and
    * pins itself to it durably, so a mid-stream swap takes effect for
    * NEW batches only and replay keeps every batch on its original
    * model (see [[classifyVersionedBatch]]). */
  def classifyVersionedEachBatch(stream: DataFrame, modelDir: String,
      idCol: String, textCol: String, labelCol: String, outDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        classifyVersionedBatch(spark, batch, batchId, modelDir,
          idCol, textCol, labelCol, outDir)
      }
      .start()
  }

  def vecIngestEachBatch(stream: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], layoutDir: String,
      checkpoint: Option[String] = None,
      labelCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // labelCol turns the landing into the FILTERED-ANN layout
    // (stream_vec_ingest_filtered): partitions are (label, cell,
    // __batch_id), so the r14 batch-built vec_ann_filtered layout stays
    // maintainable under continuous ingest — still map-only per batch
    // (label is an input column, cell a codegen'd projection), still
    // replay-exact (a replayed batch dynamically overwrites exactly its
    // own (label, cell, batch) partitions), and the filtered query path
    // prunes BOTH dimensions unchanged.
    val parts = labelCol.toSeq ++ Seq("cell", "__batch_id")
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("cell",
            graft.ops.VectorOps.ivfCell(col(vecCol), centroids))
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(parts: _*).parquet(layoutDir)
      }
      .start()
  }

  /** Streaming PQ-encode ingest — stream_pq_ingest: micro-batches of
    * embeddings are encoded against a FROZEN quantizer model
    * ([[graft.ops.VectorOps.pqEncodeRows]] — map-only, no shuffle) and
    * landed replay-exact under `[cell=K/]__batch_id=N` with dynamic
    * partition overwrite, extending the persisted PQ layout
    * incrementally. Per-batch sort leads with the partition columns so
    * the id order (rerank row-group skipping) survives the partitioned
    * writer. The batch tier's `pqCosineTopKFromLayout` answers queries
    * from the accumulated layout unchanged — ADC still reads only
    * (id, codes), probes still prune cell partitions. */
  def pqIngestEachBatch(stream: DataFrame, idCol: String, vecCol: String,
      model: graft.ops.VectorOps.PqIndexModel, layoutDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val encoded = graft.ops.VectorOps
          .pqEncodeRows(batch, idCol, vecCol, model)
          .withColumn("__batch_id", lit(batchId))
        val (parts, sorted) =
          if (model.centroids.nonEmpty)
            (Seq("cell", "__batch_id"),
              Seq(col("cell"), col("__batch_id"), col(idCol)))
          else (Seq("__batch_id"), Seq(col("__batch_id"), col(idCol)))
        encoded.sortWithinPartitions(sorted: _*)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(parts: _*).parquet(layoutDir)
      }
      .start()
  }

  /** Per-batch BINARY-QUANTIZATION ingest — stream_recall_eval's index
    * maintenance face: each arriving vector gets its 1-bit sign
    * signature ([[graft.ops.VectorOps.signPack]], a codegen'd map-only
    * projection — no shuffle, no training state) computed ONCE at
    * ingest and landed beside the floats under `__batch_id=N` with
    * dynamic partition overwrite (replay-idempotent: a re-sent batch
    * overwrites exactly its own partition). Serving then reads
    * signatures back instead of re-signing the corpus per query — the
    * point of paying the bit-pack at write time. */
  def bqIngestEachBatch(stream: DataFrame, idCol: String, vecCol: String,
      dim: Int, layoutDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("sig",
            graft.ops.VectorOps.signPack(col(vecCol), dim))
          .withColumn("__batch_id", lit(batchId))
          .sortWithinPartitions(col("__batch_id"), col(idCol))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(layoutDir)
      }
      .start()
  }

  /** Per-batch AS-OF ENRICHMENT against a STATIC right side —
    * stream_asof_enrich: each micro-batch of facts is as-of joined
    * ([[graft.ops.Joins.asOfJoin]] — the one-shuffle union trick) to an
    * immutable reference table and landed under `__batch_id=N` with
    * dynamic partition overwrite. Correct under ANY batch split because
    * a left row's match depends only on itself and the static right —
    * no cross-batch state at all — and replay-idempotent by the
    * partition-overwrite construction. (A CHANGING right side is the
    * temporal-join problem: pair the stream with the SCD2 dim store and
    * [[graft.ops.Joins.temporalJoin]] instead.) */
  def asofEnrichEachBatch(stream: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      rightTieBreak: String, rightValueCols: Seq[String], outDir: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Joins.asOfJoin(batch, right, leftKey, rightKey,
            leftTs, rightTs, rightTieBreak, rightValueCols)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(outDir)
      }
      .start()
  }

  /** Streaming data-quality gate — stream_dq_checks. Each micro-batch
    * computes all rule-violation counts in ONE pass (a single 1-row
    * aggregate, map-side combined, melted to (rule, n_violations) rows)
    * and lands them under its own `__batch_id` partition with dynamic
    * overwrite — the same replay-idempotence construction as the
    * incremental-dedupe sinks: a re-run batch overwrites exactly its
    * own report partition. Readers get the corpus-lifetime report with
    * `groupBy(rule).sum(n_violations)` — per-row rules sum across
    * batches, so the accumulated report equals the batch-free
    * computation over all input ever seen. `rules` maps rule name →
    * VIOLATION predicate (true = row violates). */
  def dqReportEachBatch(stream: DataFrame, rules: Seq[(String, Column)],
      outDir: String, checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dqReportBatch(batch, rules, outDir, batchId)
      }
      .start()
  }

  /** One micro-batch of [[dqReportEachBatch]] — public so the replay
    * contract is directly testable: calling this twice with the same
    * `batchId` overwrites the same partition, leaving the summed report
    * unchanged (StreamingSpec pins it). */
  def dqReportBatch(batch: DataFrame, rules: Seq[(String, Column)],
      outDir: String, batchId: Long): Unit = {
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      // coalesce: an empty batch must report 0, not null
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"v$i")
    }
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', v$i" }.mkString(", ")
    batch.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
      .withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(outDir)
  }

  /** Per-micro-batch JDBC upsert — stream_upsert_sink. The batch is
    * PK-deduped (keep the max of `orderCol` per key within the batch)
    * before hitting the sink, so replays and intra-batch dupes stay
    * idempotent. */
  def upsertEachBatch(stream: DataFrame, sink: JdbcSink, table: String,
      pk: Seq[String], orderCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = graft.ops.Dedupe.keepLast(batch, pk, col(orderCol))
        sink.ensureTable(table, deduped.schema, pk)
        sink.upsert(deduped, table, pk)
      }
      .start()
}
