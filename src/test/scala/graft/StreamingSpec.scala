package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sink.JdbcSink
import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream_dedupe: dropDuplicatesWithinWatermark across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val deduped = in.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData((ts("2024-01-01 10:00:00"), "a", 1.0),
               (ts("2024-01-01 10:01:00"), "a", 2.0), // dupe in-batch
               (ts("2024-01-01 10:02:00"), "b", 3.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 10:30:00"), "a", 4.0)) // dupe across batches
    q.processAllAvailable()
    q.stop()
    val keys = spark.table("dedup_out").select("k").as[String].collect().toSeq
    assert(keys.sorted == Seq("a", "b")) // one row per key within watermark
  }

  test("late data beyond the watermark is dropped from windowed aggs") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    in.addData((ts("2024-01-01 10:05:00"), 1.0))
    q.processAllAvailable()
    // advance watermark far past the first window
    in.addData((ts("2024-01-01 11:00:00"), 2.0))
    q.processAllAvailable()
    // this event is > 10 min behind the watermark (10:50) -> dropped
    in.addData((ts("2024-01-01 10:06:00"), 99.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 12:00:00"), 3.0)) // flush second window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_out")
      .select(col("window.start").cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    assert(rows("2024-01-01 10:00:00") == 1) // late row did NOT bump n to 2
  }

  test("statefulUserCounts accumulates custom state across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val counted = StreamOps.statefulUserCounts(
      in.toDF().toDF("user_id", "event_id"))
    val q = counted.writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    in.addData((1L, 10L), (1L, 11L), (2L, 20L))
    q.processAllAvailable()
    in.addData((1L, 12L)) // state for user 1 must carry over
    q.processAllAvailable()
    q.stop()
    // append mode emits one row per (key, batch); the LAST row per key
    // carries the accumulated running totals
    val last = spark.table("state_out")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("max_event_id").as("m"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(last(1L) == ((3L, 12L))) // 2 from batch 1 + 1 from batch 2
    assert(last(2L) == ((1L, 20L)))
  }

  test("statefulTopK keeps a k-bounded leaderboard across micro-batches; " +
      "max-per-rank collapse equals the batch row_number") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val src = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamOps.statefulTopK(src, k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    // batch 1: three events in hour 9, tie on value between ids 3 and 1
    in.addData((1L, ts(9), "view", 5.00), (3L, ts(9), "view", 5.00),
      (2L, ts(9), "view", 1.00))
    q.processAllAvailable()
    // batch 2: a new max arrives — must displace rank 1, push the
    // (500, id=1) tie-winner to rank 2, and evict id=3 (state is bounded)
    in.addData((4L, ts(9), "view", 9.00))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("topk_out")
      .groupBy("event_type", "bucket_start", "rk")
      .agg(max(struct(col("value_cents"), (-col("event_id")).as("negid")))
        .as("m"))
      .select(col("rk"), col("m.value_cents"), (-col("m.negid")).as("id"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // final leaderboard: rank1 = (900, 4), rank2 = (500, 1) — the tie at
    // 500 broke to the SMALLER event_id even though id 3 arrived first
    assert(fin.toSeq == Seq((1, 900L, 4L), (2, 500L, 1L)))
  }

  test("packSequencesStream continues offsets across micro-batches " +
      "without re-packing history") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val packed = StreamOps.packSequencesStream(
      in.toDF().toDF("doc_id", "lang", "text"),
      "doc_id", "lang", "text", budgetTokens = 10)
    val q = packed.writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    // batch 1: en stream takes 4 + 5 = 9 tokens; fr takes 7
    in.addData((1L, "en", "a b c d"), (2L, "en", "a b c d e"),
      (10L, "fr", "a b c d e f g"))
    q.processAllAvailable()
    // batch 2: en continues at offset 9 (bin 0 — first-token rule),
    // then 12 → bin 1; fr continues at 7; out-of-order id 3 arrives
    // AFTER 4 was packed in no batch — both are batch-2, so in-batch
    // id order applies (3 before 4)
    in.addData((4L, "en", "x y z w"), (3L, "en", "p q r"),
      (11L, "fr", "h i j k"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pack_out")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((5L, 4L, 0L)))
    assert(got(10L) == ((7L, 0L, 0L)))
    assert(got(3L) == ((3L, 9L, 0L)))   // batch 2, packed before id 4
    assert(got(4L) == ((4L, 12L, 1L)))  // crosses into bin 1
    assert(got(11L) == ((4L, 7L, 0L)))  // fr offset carried over
  }

  test("sessionizeWithTimeout closes sessions on watermark passage and " +
      "evicts their state") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sessions = StreamOps.sessionizeWithTimeout(
      in.toDF().toDF("user_id", "ts"), "user_id", "ts", gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // open a session for user 1
    in.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    assert(spark.table("sess_out").isEmpty) // still open — nothing emitted
    // another user's event pushes the watermark past 10:10 + 30min
    in.addData((2L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    val done = spark.table("sess_out")
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(done == Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L)))
    // user 2's session is open, not emitted; a later event closes it
    in.addData((3L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sess_out").select("user_id")
      .as[Long].collect().toSet
    assert(all == Set(1L, 2L))
  }

  test("stream_upsert_sink: foreachBatch upserts each micro-batch, " +
      "replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert")
    java.nio.file.Files.write(dir.resolve("one.csv"),
      "k,ord,v\n1,1,a\n1,2,b\n2,1,c\n".getBytes) // in-batch dupe on k=1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ord",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val sink = JdbcSink("jdbc:derby:memory:streamup;create=true")
    val stream = StreamOps.fileStreamCsv(spark, s"$dir/*.csv", schema)
    val q = StreamOps.upsertEachBatch(stream, sink, "st", Seq("k"), "ord")
    q.awaitTermination()
    val got = sink.readBack(spark, "st").select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "b"), (2L, "c"))) // keep-last within batch

    // replay the same data (new file, same keys): last write still wins
    java.nio.file.Files.write(dir.resolve("two.csv"),
      "k,ord,v\n2,9,z\n".getBytes)
    val q2 = StreamOps.upsertEachBatch(
      StreamOps.fileStreamCsv(spark, s"$dir/*.csv", schema),
      sink, "st", Seq("k"), "ord")
    q2.awaitTermination()
    val got2 = sink.readBack(spark, "st").select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(got2 == Set((1L, "b"), (2L, "z")))
  }

  test("cdcApplyEachBatch: sequential epochs compose — update, delete, " +
      "resurrect across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-cdc")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType)))
    val sink = JdbcSink("jdbc:derby:memory:streamcdcspec;create=true")
    // persistent checkpoint: each epoch processes ONLY its new file, so
    // the assertions prove sequential composition of per-batch applies
    // (not a global single-batch collapse)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-cdc-ckpt").toString
    def runOnce(): Unit = {
      val q = StreamOps.cdcApplyEachBatch(
        StreamOps.fileStreamCsv(spark, s"$dir/*.csv", schema),
        sink, "st_cdc_spec", Seq("k"), Seq("ts"),
        checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    def state: Set[(Long, String)] =
      sink.readBack(spark, "st_cdc_spec").select("k", "v")
        .as[(Long, String)].collect().toSet
    // epoch 1: insert 1,2,3; intra-batch latest-wins on k=1
    java.nio.file.Files.write(dir.resolve("one.csv"),
      "k,v,op,ts\n1,a0,I,1\n1,a1,U,2\n2,b,I,1\n3,c,I,1\n".getBytes)
    runOnce()
    assert(state == Set((1L, "a1"), (2L, "b"), (3L, "c")))
    // epoch 2: delete 2, update 3 — applies to the ACCUMULATED state
    java.nio.file.Files.write(dir.resolve("two.csv"),
      "k,v,op,ts\n2,,D,3\n3,c2,U,3\n".getBytes)
    runOnce()
    assert(state == Set((1L, "a1"), (3L, "c2")))
    // epoch 3: resurrect 2 — delete history must not block re-insert;
    // in-batch delete-then-insert on k=3 collapses to the later insert
    java.nio.file.Files.write(dir.resolve("three.csv"),
      "k,v,op,ts\n2,b2,I,4\n3,,D,4\n3,c3,I,5\n".getBytes)
    runOnce()
    assert(state == Set((1L, "a1"), (2L, "b2"), (3L, "c3")))
  }

  test("scd2EachBatch: epochs mint versions in order, re-sends are " +
      "no-ops, generations retire") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-scd2")
    val dimDir = base.resolve("dim").toString
    val srcDir = base.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    val ckpt = base.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("attr",
        org.apache.spark.sql.types.StringType)))
    def ts(epoch: Long) = java.sql.Timestamp.valueOf(s"2025-0$epoch-01 00:00:00")
    def runOnce(): Unit = {
      val q = StreamOps.scd2EachBatch(
        StreamOps.fileStreamCsv(spark, s"$srcDir/*.csv", schema),
        Seq("k"), Seq("attr"), dimDir,
        b => org.apache.spark.sql.functions.lit(ts(b + 1)),
        checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    def dim: Set[(Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)] =
      StreamOps.scd2Dim(spark, dimDir)
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean)].collect().toSet
    // epoch 0 (eff ts 2025-01): first sighting of keys 1 and 2
    java.nio.file.Files.write(srcDir.resolve("one.csv"),
      "k,attr\n1,a\n2,b\n".getBytes)
    runOnce()
    assert(dim == Set(
      (1L, "a", ts(1), None, true), (2L, "b", ts(1), None, true)))
    // epoch 1 (eff ts 2025-02): key 1 changes, key 2 re-sends (no-op)
    java.nio.file.Files.write(srcDir.resolve("two.csv"),
      "k,attr\n1,a2\n2,b\n".getBytes)
    runOnce()
    assert(dim == Set(
      (1L, "a", ts(1), Some(ts(2)), false),
      (1L, "a2", ts(2), None, true),
      (2L, "b", ts(1), None, true)))
    // epoch 2 (eff ts 2025-03): key 1 changes AGAIN, key 3 is new —
    // two closed versions of key 1 now coexist in the history
    java.nio.file.Files.write(srcDir.resolve("three.csv"),
      "k,attr\n1,a3\n3,c\n".getBytes)
    runOnce()
    assert(dim == Set(
      (1L, "a", ts(1), Some(ts(2)), false),
      (1L, "a2", ts(2), Some(ts(3)), false),
      (1L, "a3", ts(3), None, true),
      (2L, "b", ts(1), None, true),
      (3L, "c", ts(3), None, true)))
    // generation hygiene: at most two generations remain (read + written)
    val gens = new java.io.File(s"$dimDir/current").listFiles()
      .filter(_.getName.startsWith("__gen=")).map(_.getName).toSeq
    assert(gens.length <= 2 && gens.contains("__gen=2"), gens.toString)
    // a partially-written newer generation (crash mid-write: files, no
    // _SUCCESS) must be invisible to readers — state is unchanged
    val partial = java.nio.file.Paths.get(s"$dimDir/current/__gen=99")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(dim == Set(
      (1L, "a", ts(1), Some(ts(2)), false),
      (1L, "a2", ts(2), Some(ts(3)), false),
      (1L, "a3", ts(3), None, true),
      (2L, "b", ts(1), None, true),
      (3L, "c", ts(3), None, true)))
  }

  test("asofEnrichEachBatch: two epochs union to the batch as-of join") {
    val base = java.nio.file.Files.createTempDirectory("graft-asof-stream")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val right = Seq(
      (1L, ts("2024-01-05 00:00:00"), 100L, 1.5),
      (1L, ts("2024-01-20 00:00:00"), 101L, 2.5),
      (2L, ts("2024-01-10 00:00:00"), 200L, 3.5))
      .toDF("k", "rts", "o_id", "o_val")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    def runOnce(): Unit = {
      val q = StreamOps.asofEnrichEachBatch(
        StreamOps.fileStreamCsv(spark, s"$src/*.csv", schema),
        right, "k", "k", "ts", "rts", "o_id", Seq("o_id", "o_val"),
        out, checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    // epoch 1: one event between the two k=1 orders; epoch 2: one after
    // both, one with no match at all
    java.nio.file.Files.write(src.resolve("one.csv"),
      "event_id,k,ts\n10,1,2024-01-10 00:00:00\n".getBytes)
    runOnce()
    java.nio.file.Files.write(src.resolve("two.csv"),
      ("event_id,k,ts\n11,1,2024-01-25 00:00:00\n" +
        "12,9,2024-01-25 00:00:00\n").getBytes)
    runOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "asof_o_id", "asof_o_val")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      (10L, Some(100L), Some(1.5)),   // epoch 1: latest order <= ts
      (11L, Some(101L), Some(2.5)),   // epoch 2: picks the later order
      (12L, None, None)))             // unknown key -> nulls
  }

  test("scd2 closed-log compaction folds partitions; replay re-append " +
      "is invisible (distinct)") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2-fold")
    val dimDir = base.resolve("dim").toString
    val srcDir = base.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    val ckpt = base.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("attr",
        org.apache.spark.sql.types.StringType)))
    def ts(e: Long) = java.sql.Timestamp.valueOf(s"2025-0$e-01 00:00:00")
    def runOnce(): Unit = {
      val q = StreamOps.scd2EachBatch(
        StreamOps.fileStreamCsv(spark, s"$srcDir/*.csv", schema),
        Seq("k"), Seq("attr"), dimDir,
        b => org.apache.spark.sql.functions.lit(ts(b + 1)),
        checkpoint = Some(ckpt), compactAfter = 1)
      q.awaitTermination()
    }
    def dim = StreamOps.scd2Dim(spark, dimDir)
      .as[(Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)].collect().toSet
    // four epochs, each changing key 1 -> each closes one version
    (0 to 3).foreach { e =>
      java.nio.file.Files.write(srcDir.resolve(s"f$e.csv"),
        s"k,attr\n1,v$e\n".getBytes)
      runOnce()
    }
    val expect = Set(
      (1L, "v0", ts(1), Some(ts(2)), false),
      (1L, "v1", ts(2), Some(ts(3)), false),
      (1L, "v2", ts(3), Some(ts(4)), false),
      (1L, "v3", ts(4), None, true))
    assert(dim == expect)
    // compaction bounded the closed listing: <= compactAfter + current
    // batch + generation = 3 partitions (4 closing epochs happened)
    val parts = new java.io.File(s"$dimDir/closed").listFiles()
      .filter(_.getName.startsWith("__batch_id=")).map(_.getName)
    assert(parts.length <= 3, parts.mkString(","))
    assert(parts.exists(_.startsWith("__batch_id=-")), "no generation")
    // simulate a replayed fold's double-append: duplicate one closed row
    val genName = parts.find(_.startsWith("__batch_id=-")).get
    val one = spark.read
      .parquet(s"$dimDir/closed/$genName").limit(1)
    one.write.mode("append").parquet(s"$dimDir/closed/$genName")
    assert(dim == expect) // distinct() hides the artifact
  }

  test("vecIngestEachBatch: epochs accumulate cells; the layout query " +
      "sees every increment") {
    import graft.ops.VectorOps
    val base = java.nio.file.Files.createTempDirectory("graft-vecingest")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val layout = s"$base/layout"
    val ckpt = s"$base/ckpt"
    // two fixed centroids on the x/y axes: vectors sort into cell 0 or 1
    val centroids = Array(Array(1f, 0f), Array(0f, 1f))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    def runOnce(): Unit = {
      val q = StreamOps.vecIngestEachBatch(
        StreamOps.fileStreamParquet(spark, s"$src/*", schema),
        "embedding", centroids, layout, checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    def landed: Map[Long, Int] =
      spark.read.parquet(layout).select("vec_id", "cell")
        .as[(Long, Int)].collect().toMap
    Seq((1L, Seq(0.9f, 0.1f)), (2L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding").write.parquet(s"$src/b1")
    runOnce()
    assert(landed == Map(1L -> 0, 2L -> 1))
    // epoch 2: only the new batch is processed, old partitions untouched
    Seq((3L, Seq(0.8f, 0.2f))).toDF("vec_id", "embedding")
      .write.parquet(s"$src/b2")
    runOnce()
    assert(landed == Map(1L -> 0, 2L -> 1, 3L -> 0))
    // query path reads the accumulated layout (both epochs) pruned
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = VectorOps.ivfQueryLayout(spark, layout, "vec_id",
      "embedding", q.select("embedding"), "embedding", k = 2,
      centroids, nProbe = 1)
    assert(top.select("vec_id").as[Long].collect().toSet == Set(1L, 3L))
    // offline maintenance compaction: flatten cell=K/__batch_id=N to the
    // batch tier's cell=K shape — same rows, same query results; any
    // underscore-prefixed sidecar (the freshness-fingerprint protocol)
    // must survive the swap or the next fingerprint-gated reader would
    // rebuild the freshly compacted layout as stale
    val fp = new java.io.File(s"$layout/_centroids.fp")
    java.nio.file.Files.write(fp.toPath,
      "fp-sentinel".getBytes("UTF-8"))
    VectorOps.compactIvfLayout(spark, layout, "vec_id")
    assert(fp.exists() && new String(java.nio.file.Files
        .readAllBytes(fp.toPath), "UTF-8") == "fp-sentinel",
      "compaction dropped the _centroids.fp sidecar")
    val cellDirs = new java.io.File(layout).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(cellDirs.forall(_.startsWith("cell=")), cellDirs.mkString(","))
    assert(cellDirs.flatMap(c => new java.io.File(s"$layout/$c")
      .listFiles().map(_.getName))
      .forall(n => !n.startsWith("__batch_id=")))
    assert(landed == Map(1L -> 0, 2L -> 1, 3L -> 0))
    val top2 = VectorOps.ivfQueryLayout(spark, layout, "vec_id",
      "embedding", q.select("embedding"), "embedding", k = 2,
      centroids, nProbe = 1)
    assert(top2.select("vec_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("vecIngestEachBatch with labelCol: (label, cell) incremental " +
      "landing is replay-exact and the filtered query prunes BOTH " +
      "partition dimensions") {
    import graft.ops.VectorOps
    val base = java.nio.file.Files.createTempDirectory("graft-vecingf")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val layout = s"$base/layout"
    val centroids = Array(Array(1f, 0f), Array(0f, 1f))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.IntegerType)))
    def runOnce(ckpt: String): Unit = {
      val q = StreamOps.vecIngestEachBatch(
        StreamOps.fileStreamParquet(spark, s"$src/*", schema),
        "embedding", centroids, layout, checkpoint = Some(ckpt),
        labelCol = Some("label"))
      q.awaitTermination()
    }
    Seq((1L, Seq(0.9f, 0.1f), 1), (2L, Seq(0.1f, 0.9f), 1),
        (3L, Seq(0.8f, 0.2f), 2))
      .toDF("vec_id", "embedding", "label").write.parquet(s"$src/b1")
    runOnce(s"$base/ckpt")
    // second epoch accumulates under its own batch partitions
    Seq((4L, Seq(0.7f, 0.3f), 2)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$src/b2")
    runOnce(s"$base/ckpt")
    def landed: Set[(Long, Int, Int)] =
      spark.read.parquet(layout).select("vec_id", "label", "cell")
        .as[(Long, Int, Int)].collect().toSet
    val expect = Set((1L, 1, 0), (2L, 1, 1), (3L, 2, 0), (4L, 2, 0))
    assert(landed == expect)
    // replay-exactness: a FRESH checkpoint re-reads every source file
    // (same content, new batch numbering) — dynamic partition overwrite
    // rewrites each batch's own (label, cell, batch) partitions and the
    // landed relation is unchanged
    runOnce(s"$base/ckpt2")
    assert(landed == expect)
    // filtered query: label pins one partition branch, probes the other
    val q = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("embedding")
    val got = VectorOps.ivfQueryLayout(spark, layout, "vec_id",
      "embedding", q, "embedding", k = 2, centroids, nProbe = 1,
      extraFilter = $"label" === 2)
    assert(got.select("vec_id").as[Long].collect().toSet == Set(3L, 4L))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("label")
      && plan.contains("cell"), plan.take(2000))
    // maintenance compaction must PRESERVE the label dimension —
    // flattening to cell-only would silently drop the filtered tier's
    // label PartitionFilters
    VectorOps.compactIvfLayout(spark, layout, "vec_id")
    val lvl1 = new java.io.File(layout).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(lvl1.forall(_.startsWith("label=")), lvl1.mkString(","))
    val lvl2 = new java.io.File(s"$layout/${lvl1.head}").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(lvl2.forall(_.startsWith("cell=")), lvl2.mkString(","))
    assert(landed == expect)
    val got2 = VectorOps.ivfQueryLayout(spark, layout, "vec_id",
      "embedding", q, "embedding", k = 2, centroids, nProbe = 1,
      extraFilter = $"label" === 2)
    assert(got2.select("vec_id").as[Long].collect().toSet == Set(3L, 4L))
    val plan2 = got2.queryExecution.executedPlan.toString
    assert(plan2.contains("PartitionFilters") && plan2.contains("label")
      && plan2.contains("cell"), plan2.take(2000))
  }

  test("classifyEachBatch: frozen model scores successive drops; old " +
      "batch outputs untouched; stream total equals batch nbApply") {
    import graft.ops.CorpusOps
    val base = java.nio.file.Files.createTempDirectory("graft-nbstream")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val trainDocs = Seq(
      (1L, "a a b", "ax"), (2L, "a b b", "ax"),
      (3L, "c d d", "by"), (4L, "c c d", "by")).toDF("doc_id", "text", "lang")
    val model = CorpusOps.nbTrainModel(trainDocs, "doc_id", "text",
      "lang", isTrain = lit(true))
    val schema = trainDocs.schema
    def runOnce(): Unit = {
      val q = StreamOps.classifyEachBatch(
        StreamOps.fileStreamParquet(spark, s"$src/*", schema),
        model, "doc_id", "text", "lang", out, checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    def landed: Map[Long, (String, Boolean)] =
      spark.read.parquet(out).select("doc_id", "pred", "is_correct")
        .as[(Long, String, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    Seq((30L, "a a a b", "ax")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$src/b1")
    runOnce()
    assert(landed == Map(30L -> (("ax", true))))
    // epoch 2: only the new drop is scored; batch-1 output untouched
    Seq((60L, "c d c", "by"), (90L, "", "ax"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$src/b2")
    runOnce()
    assert(landed == Map(30L -> (("ax", true)), 60L -> (("by", true)),
      90L -> (("ax", true)))) // empty doc: prior tie -> class ASC
    // the accumulated stream output equals one batch nbApply pass
    val allDocs = Seq((30L, "a a a b", "ax"), (60L, "c d c", "by"),
      (90L, "", "ax")).toDF("doc_id", "text", "lang")
    val batch = CorpusOps.nbApply(model, allDocs, "doc_id", "text", "lang")
      .select("doc_id", "pred", "score", "is_correct")
      .as[(Long, String, Double, Boolean)].collect().toSet
    val streamed = spark.read.parquet(out)
      .select("doc_id", "pred", "score", "is_correct")
      .as[(Long, String, Double, Boolean)].collect().toSet
    assert(streamed == batch)
  }

  test("classifyVersionedEachBatch: a mid-stream model swap takes " +
      "effect for NEW batches only, and replay keeps each batch on the " +
      "model generation it first scored under") {
    import graft.ops.CorpusOps
    val base = java.nio.file.Files.createTempDirectory("graft-nbver")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val modelDir = s"$base/model"
    // gen 0: a-vocabulary -> ax;  gen 1: LABELS SWAPPED (a-vocab -> by),
    // so which generation scored a batch is visible in its predictions
    val t0 = Seq((1L, "a a b", "ax"), (2L, "a b b", "ax"),
      (3L, "c d d", "by"), (4L, "c c d", "by")).toDF("doc_id", "text", "lang")
    val t1 = Seq((1L, "a a b", "by"), (2L, "a b b", "by"),
      (3L, "c d d", "ax"), (4L, "c c d", "ax")).toDF("doc_id", "text", "lang")
    CorpusOps.nbSaveModel(spark,
      CorpusOps.nbTrainModel(t0, "doc_id", "text", "lang", lit(true)),
      modelDir, 0)
    // committed generations are immutable — and the duplicate call
    // fails BEFORE staging (no orphaned gen=0.tmp left behind)
    intercept[IllegalArgumentException] {
      CorpusOps.nbSaveModel(spark,
        CorpusOps.nbTrainModel(t0, "doc_id", "text", "lang", lit(true)),
        modelDir, 0)
    }
    assert(!new java.io.File(s"$modelDir/gen=0.tmp").exists(),
      "duplicate-generation save left an orphaned staging dir")
    val schema = t0.schema
    def runOnce(): Unit = {
      val q = StreamOps.classifyVersionedEachBatch(
        StreamOps.fileStreamParquet(spark, s"$src/*", schema),
        modelDir, "doc_id", "text", "lang", out, checkpoint = Some(ckpt))
      q.awaitTermination()
    }
    def landed: Map[Long, (String, Int)] =
      spark.read.parquet(out).select("doc_id", "pred", "model_gen")
        .as[(Long, String, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val b1 = Seq((30L, "a a a b", "ax")).toDF("doc_id", "text", "lang")
    b1.write.parquet(s"$src/b1")
    runOnce() // batch 0 under gen 0
    assert(landed == Map(30L -> (("ax", 0))))
    // SWAP: commit gen 1 between batches
    CorpusOps.nbSaveModel(spark,
      CorpusOps.nbTrainModel(t1, "doc_id", "text", "lang", lit(true)),
      modelDir, 1)
    val b2 = Seq((31L, "a a a b", "ax")).toDF("doc_id", "text", "lang")
    b2.write.parquet(s"$src/b2")
    runOnce() // batch 1 under gen 1: same text now scores by
    assert(landed == Map(30L -> (("ax", 0)), 31L -> (("by", 1))))
    // crash-replay of BOTH batches after the swap: the durable binding
    // keeps batch 0 on gen 0 and batch 1 on gen 1 — outputs identical
    val before = spark.read.parquet(out)
      .select("doc_id", "pred", "score", "model_gen")
      .as[(Long, String, Double, Int)].collect().toSet
    StreamOps.classifyVersionedBatch(spark, b1, 0L, modelDir,
      "doc_id", "text", "lang", out)
    StreamOps.classifyVersionedBatch(spark, b2, 1L, modelDir,
      "doc_id", "text", "lang", out)
    val after = spark.read.parquet(out)
      .select("doc_id", "pred", "score", "model_gen")
      .as[(Long, String, Double, Int)].collect().toSet
    assert(after == before)
  }

  test("stream-stream interval join matches across micro-batches and " +
      "emits each match exactly once") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamOps.intervalJoin(
      views.toDF().toDF("user_id", "view_ts", "view_id"),
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      "user_id", "view_ts", "click_ts", windowMinutes = 10)
      .select("user_id", "view_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    // batch 1: a view arrives, its click hasn't yet
    views.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    clicks.addData((2L, ts("2024-01-01 10:00:00"), 900L)) // wrong user
    q.processAllAvailable()
    assert(spark.table("ij_out").count() == 0)
    // batch 2: the matching click arrives within the window; also an
    // out-of-window click (11 min later) that must NOT match
    clicks.addData((1L, ts("2024-01-01 10:05:00"), 200L),
                   (1L, ts("2024-01-01 10:11:00"), 300L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_out")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 200L))) // one match, exactly once
  }

  test("left-outer interval join emits unmatched lefts with null right " +
      "only after the watermark closes their window") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamOps.intervalJoin(
      views.toDF().toDF("user_id", "view_ts", "view_id"),
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      "user_id", "view_ts", "click_ts", windowMinutes = 10,
      watermark = "5 minutes", joinType = "leftOuter")
      .select($"user_id", $"view_id", $"click_id")
    val q = joined.writeStream.format("memory").queryName("oj_out")
      .outputMode("append").start()
    // view 100 will match; view 101 never will
    views.addData((1L, ts("2024-01-01 10:00:00"), 100L),
                  (2L, ts("2024-01-01 10:00:00"), 101L))
    clicks.addData((1L, ts("2024-01-01 10:05:00"), 200L))
    q.processAllAvailable()
    val early = spark.table("oj_out").as[(Long, Long, Option[Long])]
      .collect().toSet
    // the unmatched view must NOT have emitted yet — its window is open
    assert(early == Set((1L, 100L, Some(200L))))
    // advance both watermarks far past view_ts + 10min + 5min delay
    views.addData((9L, ts("2024-01-01 12:00:00"), 900L))
    clicks.addData((9L, ts("2024-01-01 12:00:00"), 901L))
    q.processAllAvailable()
    // one more batch: outer-null emission happens on the batch AFTER the
    // watermark update is committed
    views.addData((8L, ts("2024-01-01 12:00:01"), 800L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("oj_out").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(got.contains((2L, 101L, None))) // unmatched left, null right
    assert(got.contains((1L, 100L, Some(200L))))
  }

  test("RocksDB state store yields identical results to the default " +
      "HDFS-backed store on a stateful query") {
    // the provider changes state RESIDENCE (off-heap/on-disk vs heap
    // objects), never semantics — run the same custom-state aggregation
    // under both and compare
    def run(provider: String): Seq[(Long, Long, Long)] = {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Long)]
      in.addData(Seq.tabulate(200)(i => (i % 7L, i.toLong)): _*)
      StreamOps.runToMemory(
        StreamOps.statefulUserCounts(in.toDF().toDF("user_id", "event_id")),
        outputMode = "append", stateStore = provider)
        .groupBy("user_id")
        .agg(max("n_events").as("n"), max("max_event_id").as("m"))
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    }
    val hdfs = run(StreamOps.HdfsStateStore)
    val rocks = run(StreamOps.RocksDbStateStore)
    assert(rocks == hdfs)
    assert(hdfs.map(_._2).sum == 200) // and the counts are the real ones
  }

  test("file stream with archive moves processed files") {
    val src = java.nio.file.Files.createTempDirectory("graft-arch-src")
    val arch = java.nio.file.Files.createTempDirectory("graft-arch-dst")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-arch-ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val out = java.nio.file.Files.createTempDirectory("graft-arch-out")
    def runOnce(): Unit = {
      val df = StreamOps.fileStreamCsv(spark, s"$src/*.csv", schema,
        archiveDir = Some(arch.toString))
      // parquet sink (memory sink cannot resume from a checkpoint)
      val q = df.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    java.nio.file.Files.write(src.resolve("a.csv"), "k\n1\n2\n".getBytes)
    runOnce()
    assert(spark.read.parquet(out.toString).count() == 2)
    // cleanSource archiving is lazy: completed-batch files are cleaned
    // when LATER batches commit. Drive a second batch, then poll.
    java.nio.file.Files.write(src.resolve("b.csv"), "k\n3\n".getBytes)
    runOnce()
    val deadline = System.currentTimeMillis() + 20000
    var moved = false
    while (!moved && System.currentTimeMillis() < deadline) {
      moved = !java.nio.file.Files.exists(src.resolve("a.csv"))
      if (!moved) Thread.sleep(250)
    }
    assert(moved, "source file was not archived after a subsequent batch")
  }

  test("near-dup streaming dedupe: history gates near-COPIES (not just " +
      "exact) across epochs; dropped docs never gate; tiny docs land") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("graft_neardup")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val bands = base.resolve("bands").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("body",
        org.apache.spark.sql.types.StringType)))
    def runOnce(): Unit = {
      val q = StreamOps.withStatePartitions(spark, 4) {
        StreamOps.neardupDedupeEachBatch(
          StreamOps.fileStreamCsv(spark, s"$src/*.csv", schema),
          "doc_id", "body", bands, out, ckpt)
      }
      q.awaitTermination()
    }
    // 20 tokens; "nearCopy" differs in ONE trailing token — 3-shingle
    // Jaccard 15/21 ≈ 0.714 ≥ 0.5; "far" shares no shingle
    val baseDoc = (1 to 20).map("w" + _).mkString(" ")
    val nearCopy = (1 to 19).map("w" + _).mkString(" ") + " zz"
    val far = (1 to 20).map("q" + _).mkString(" ")
    java.nio.file.Files.write(src.resolve("f1.csv"),
      s"doc_id,body\n1,$baseDoc\n2,$far\n".getBytes("UTF-8"))
    runOnce()
    // epoch 2: 5 near-dups landed doc 1 (dropped); 6 is fresh (lands);
    // 7 near-dups 6 in-batch (dropped: lower id gates); 8 is tiny (no
    // shingle — must land)
    val fresh = (1 to 20).map("x" + _).mkString(" ")
    val freshNear = (1 to 19).map("x" + _).mkString(" ") + " yy"
    java.nio.file.Files.write(src.resolve("f2.csv"),
      s"doc_id,body\n5,$nearCopy\n6,$fresh\n7,$freshNear\n8,hi there\n"
        .getBytes("UTF-8"))
    runOnce()
    // epoch 3: 9 near-dups the DROPPED doc 7's text — doc 7 never
    // landed, so only landed doc 6 gates; 9 still near-dups 6 → dropped.
    // 10 near-dups dropped doc 5's SOURCE (doc 1, landed) → dropped.
    java.nio.file.Files.write(src.resolve("f3.csv"),
      s"doc_id,body\n9,$freshNear\n10,$baseDoc\n".getBytes("UTF-8"))
    runOnce()
    val landed = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 2L, 6L, 8L))
  }

  test("incremental dedupe: key table persists across epochs and an " +
      "identical re-arrival lands nothing") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("graft_incdedup")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val keys = base.resolve("keys").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("body",
        org.apache.spark.sql.types.StringType)))
    def runOnce(): Unit = {
      val q = StreamOps.withStatePartitions(spark, 4) {
        StreamOps.incrementalDedupeEachBatch(
          StreamOps.fileStreamCsv(spark, s"$src/*.csv", schema),
          "doc_id", "body", keys, out, ckpt)
      }
      q.awaitTermination()
    }
    java.nio.file.Files.write(src.resolve("f1.csv"),
      "doc_id,body\n1,aa bb\n2,cc dd\n".getBytes("UTF-8"))
    runOnce()
    // epoch 3 semantics: the SAME bodies arrive again two epochs later
    // under new ids — history (not watermark state) must drop them
    java.nio.file.Files.write(src.resolve("f2.csv"),
      "doc_id,body\n7,ee ff\n".getBytes("UTF-8"))
    runOnce()
    java.nio.file.Files.write(src.resolve("f3.csv"),
      "doc_id,body\n8,aa bb\n9,ee ff\n".getBytes("UTF-8"))
    runOnce()
    val landed = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 2L, 7L))
    assert(spark.read.parquet(keys).count() == 3) // one key per landed doc
  }

  test("incremental dedupe batch fn is replay-idempotent across the " +
      "crash window between the two writes") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("graft_increplay")
    val keys = base.resolve("keys").toString
    val out = base.resolve("out").toString
    val b0 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "body")

    // attempt 1 of batch 0 completes both writes
    StreamOps.incrementalDedupeBatch(b0, 0L, "doc_id", "body", keys, out)
    assert(spark.read.parquet(out).count() == 2)

    // replay batch 0 verbatim (epoch never committed): must overwrite
    // its own partition, not append a second copy
    StreamOps.incrementalDedupeBatch(b0, 0L, "doc_id", "body", keys, out)
    assert(spark.read.parquet(out).count() == 2, "full replay duplicated")

    // the VERDICT crash window: attempt wrote outDir but died before the
    // key write. Simulate by deleting batch 0's key partition, then
    // replay — the anti-join must not see the batch's own keys (which
    // would empty the batch and overwrite good output with nothing),
    // and the replay must still land exactly one copy.
    val keyPart = java.nio.file.Paths.get(keys, "__batch_id=0")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(keyPart).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    StreamOps.incrementalDedupeBatch(b0, 0L, "doc_id", "body", keys, out)
    assert(spark.read.parquet(out).count() == 2,
      "crash-window replay duplicated or lost rows")
    assert(spark.read.parquet(keys).count() == 2, "key table not restored")

    // and the key table still dedupes the NEXT epoch
    val b1 = Seq((3L, "aa bb"), (4L, "ee ff")).toDF("doc_id", "body")
    StreamOps.incrementalDedupeBatch(b1, 1L, "doc_id", "body", keys, out)
    val landed = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 2L, 4L))
  }

  test("embed dedupe batch fn: cross-batch + intra-batch near-dups drop, " +
      "replay overwrites instead of duplicating, quantizer is stable") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("graft_embreplay")
    val cells = base.resolve("cells").toString
    val out = base.resolve("out").toString
    val b0 = Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    StreamOps.embedDedupeBatch(b0, 0L, "vec_id", "embedding", cells, out,
      threshold = 0.9, nCentroids = 2, nAssign = 2)
    assert(spark.read.parquet(out).count() == 2)
    // centroids persisted once beside the cell table
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cells.stripSuffix("/") + "_centroids")))

    // replay batch 0 verbatim: must overwrite its own partition
    StreamOps.embedDedupeBatch(b0, 0L, "vec_id", "embedding", cells, out,
      threshold = 0.9, nCentroids = 2, nAssign = 2)
    assert(spark.read.parquet(out).count() == 2, "replay duplicated")

    // batch 1: near-dup of landed 1 drops, fresh lands, intra-batch
    // near-dup of the fresh drops (keep-first)
    val b1 = Seq(
      (3L, Seq(0.98f, 0.199f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 0f, 0.99f, 0.141f))).toDF("vec_id", "embedding")
    StreamOps.embedDedupeBatch(b1, 1L, "vec_id", "embedding", cells, out,
      threshold = 0.9, nCentroids = 2, nAssign = 2)
    val landed = spark.read.parquet(out)
      .select("vec_id").as[Long].collect().toSet
    assert(landed == Set(1L, 2L, 4L))
  }

  test("incremental dedupe key table stays bounded under many epochs " +
      "(threshold-triggered compaction) with results unchanged") {
    import graft.streaming.StreamOps
    val base = java.nio.file.Files.createTempDirectory("graft_inccompact")
    val keys = base.resolve("keys").toString
    val out = base.resolve("out").toString
    val keyRoot = new org.apache.hadoop.fs.Path(keys)
    val fs = keyRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partCount: Int =
      fs.listStatus(keyRoot).count(s =>
        s.isDirectory && s.getPath.getName.startsWith("__batch_id="))
    // 20 epochs: each lands one fresh doc and retries one seen doc
    (0 until 20).foreach { i =>
      val b = Seq((i * 10L, s"fresh doc $i"), (i * 10L + 1, "fresh doc 0"))
        .toDF("doc_id", "body")
      StreamOps.incrementalDedupeBatch(b, i.toLong, "doc_id", "body",
        keys, out, compactAfter = 5)
      assert(partCount <= 7, // ≤ threshold live parts + generation + current
        s"key table unbounded: $partCount partitions after epoch $i")
    }
    val landed = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == (0 until 20).map(_ * 10L).toSet,
      "compaction changed dedupe results")
    // key SET is exactly one key per landed doc, duplicates tolerated
    assert(spark.read.parquet(keys)
      .select("n_len", "n_fp").distinct().count() == 20)
  }

  test("dq report batch fn is replay-idempotent (same batchId " +
      "overwrites its own partition)") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files
      .createTempDirectory("graft_dq_replay").toString
    val out = s"$base/report"
    val rules = Seq(
      "k_not_null" -> col("k").isNull,
      "v_nonneg" -> (col("v") < 0.0))
    val b0 = Seq((Option(1L), 1.0), (Option.empty[Long], -2.0))
      .toDF("k", "v")
    val b1 = Seq((Option(3L), -4.0)).toDF("k", "v")
    StreamOps.dqReportBatch(b0, rules, out, 0L)
    StreamOps.dqReportBatch(b1, rules, out, 1L)
    def report = spark.read.parquet(out)
      .groupBy("rule").agg(sum("n_violations").as("n"))
      .as[(String, Long)].collect().toMap
    val first = report
    assert(first == Map("k_not_null" -> 1L, "v_nonneg" -> 2L))
    // replay batch 1 (crash-recovery rerun): the report must not double
    StreamOps.dqReportBatch(b1, rules, out, 1L)
    assert(report == first, "replayed batch inflated the dq report")
    // an EMPTY replacement batch still lands zeros, not nulls
    StreamOps.dqReportBatch(b1.limit(0), rules, out, 2L)
    assert(report == first)
  }

  test("streaming SemDeDup: pair relation tiles the batch tier's for any " +
      "batching, replay leaves the pair SET unchanged, and the landed " +
      "read prunes BOTH (cell, __batch_id) partition dimensions") {
    import sqlImplicits._
    val base = java.nio.file.Files.createTempDirectory("graft-semdedup-st")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val layout = s"$base/layout"; val pairsDir = s"$base/pairs"
    // frozen 2-cell quantizer RELATION in the integer-quantized (1e4)
    // space (k=2 ⇒ g=2: every centroid is its own super-cell, so the
    // two-level assignment degenerates to the exact argmin)
    val cents = Seq(
      (0L, Seq(10000L, 0L, 0L, 0L)), (1L, Seq(0L, 10000L, 0L, 0L)))
      .toDF("cid", "c")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    def runOnce(ckpt: String): Unit =
      StreamOps.semdedupEachBatch(
        StreamOps.fileStreamParquet(spark, s"$src/*", schema),
        "vec_id", "embedding", cents, threshold = 0.95,
        layout, pairsDir, ckpt).awaitTermination()
    // batch 0: two far-apart vectors, one per cell — no pairs
    Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(src.toString)
    runOnce(s"$base/ckpt")
    // batch 1: 3 ~ 1 (cross-batch cell 0, cos≈.982), 5 ~ 3 (batch
    // mates, cos≈.963), 4 ~ 2 (cross-batch cell 1, cos≈.995), while
    // (1,5) at cos≈.90 stays BELOW the 0.95 threshold — precision is
    // the verify's, not the blocking's
    Seq((3L, Seq(0.98f, 0.19f, 0f, 0f)), (4L, Seq(0.1f, 0.99f, 0f, 0f)),
        (5L, Seq(0.9f, 0.43f, 0f, 0f)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(src.toString)
    runOnce(s"$base/ckpt")
    def pairSet: Set[(Long, Long)] = spark.read.parquet(pairsDir)
      .select("id1", "id2").distinct()
      .as[(Long, Long)].collect().toSet
    val expect = Set((1L, 3L), (2L, 4L), (3L, 5L))
    assert(pairSet == expect, s"got $pairSet")
    // layout landed under cell=K/__batch_id=N
    val lvl1 = new java.io.File(layout).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(lvl1.forall(_.startsWith("cell=")), lvl1.mkString(","))
    // replay with a FRESH checkpoint: every file re-read as ONE batch 0
    // (new numbering) — the one-batch tiling finds the same pairs as
    // mates, dynamic overwrite rewrites partition 0, and the pair SET
    // (what the closure consumes) is unchanged
    runOnce(s"$base/ckpt2")
    assert(pairSet == expect, s"replay changed the pair set: $pairSet")
    // the landed-candidate read prunes on BOTH partition dimensions
    val probe = StreamOps.semdedupLanded(spark, layout, "vec_id",
      "embedding", Seq(0L), batchId = 1L)
    probe.collect()
    val scans = PlanAudit.collectScans(probe.queryExecution.executedPlan)
    val pf = scans.flatMap(_.metadata.get("PartitionFilters")).mkString
    assert(pf.contains("cell") && pf.contains("__batch_id"),
      s"landed read did not prune both dims: $pf")
  }

  test("bq ingest lands signPack-exact signatures, replays idempotent, " +
      "and stream_recall_eval's final epoch equals the batch audit") {
    import graft.ops.VectorOps
    import graft.streaming.StreamOps
    val d = sfDir("0.001")
    // (a) landed signatures equal a batch signPack recompute; a re-sent
    // epoch overwrites its own partition (no dup rows)
    val base = graft.queries.Fixtures.freshDir("graft_bqingest_spec")
    val src = s"$base/src"
    val landed = s"$base/landed"
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .filter(col("vec_id") < 50)
    emb.write.mode("append").parquet(src)
    def runOnce(ck: String): Unit =
      StreamOps.bqIngestEachBatch(
        StreamOps.fileStreamParquet(spark, src, emb.schema),
        "vec_id", "embedding", dim = 64, landed, Some(s"$base/$ck"))
        .awaitTermination()
    runOnce("ck1")
    val got = spark.read.parquet(landed)
    assert(got.count() == emb.count())
    val mismatch = got.filter(
      col("sig") =!= VectorOps.signPack(col("embedding"), 64)).count()
    assert(mismatch == 0, "landed sig != signPack recompute")
    runOnce("ck2") // fresh checkpoint re-processes every file: a replay
    assert(spark.read.parquet(landed).count() == emb.count(),
      "replayed epoch must overwrite, not append")
    // (b) the streaming audit's last epoch IS the batch audit
    val streamed = SparkEntry.queries("stream_recall_eval")(spark, d)
      .filter(col("epoch") === 3).drop("epoch")
    val batch = SparkEntry.queries("vec_recall_eval")(spark, d)
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "epoch-3 slice differs from vec_recall_eval")
  }
}
