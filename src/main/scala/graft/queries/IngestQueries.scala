package graft.queries

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.CsvIngest
import graft.ops.Dedupe
import graft.sink.SinkOps

/** Ingestion-parity queries (SURVEY §2.1/§2.2): the CSV read path with
  * multi-format timestamp parsing + type inference, newest-first mtime
  * ordering with upsert precedence, projection, and the logical PK upsert.
  *
  * scan_csv_glob and scan_order_mtime materialize small deterministic CSV
  * fixtures under /tmp at query time (the corpus is parquet-only); their
  * oracles are over the source parquet / literal VALUES, so the whole
  * write→glob→read→infer pipeline is what's under test.
  */
object IngestQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    // parquet → mixed-format CSV → glob read → infer → typed DataFrame
    "scan_csv_glob" -> ((s, d) => {
      // fixture keyed on the SOURCE's content fingerprint (uri+len+mtime):
      // regenerating the dataset at the same path invalidates the cache
      val tmp = s"${Fixtures.root}/graft_csv_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        val fmts = CsvIngest.DefaultFormats
        val m = pmod(col("event_id"), lit(4))
        Tables.events(s, d).select(
            col("event_id"),
            when(m === 0, date_format(col("ts"), fmts(0)))
              .when(m === 1, date_format(col("ts"), fmts(1)))
              .when(m === 2, date_format(col("ts"), fmts(2)))
              .otherwise(date_format(col("ts"), fmts(3))).as("ts"),
            when(col("event_type") === "view", lit(null))
              .otherwise(col("event_type")).as("event_type"),
            col("value"))
          .write.mode("overwrite").option("header", true).csv(tmp)
      }
      CsvIngest.readCsv(s, s"$tmp/*.csv")
        .select("event_id", "ts", "event_type", "value")
    }),

    // non-default CSV dialect: semicolon delimiter, single-quote quoting,
    // ISO-8859-1 encoding (pandas sep/quotechar/encoding parity). The
    // fixture embeds the delimiter AND a non-ASCII char in every tag so
    // a mis-set quote or charset corrupts values and fails the hash —
    // the whole write→read→infer loop runs in the non-default dialect
    "scan_csv_delim" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_csv_delim_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        Tables.events(s, d)
          .filter(pmod(col("event_id"), lit(7)) === 0)
          .select(col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            concat(col("event_type"), lit(";é")).as("tag"),
            col("value"))
          .write.mode("overwrite").option("header", true)
          .option("sep", ";").option("quote", "'")
          .option("encoding", "ISO-8859-1")
          .csv(tmp)
      }
      CsvIngest.readCsv(s, s"$tmp/*.csv", delimiter = ";",
        quote = "'", encoding = "ISO-8859-1")
        .select("event_id", "ts", "tag", "value")
    }),

    // CSV with QUOTED EMBEDDED NEWLINES (pandas reads these by default;
    // Spark needs multiLine=true, which costs file-level parallelism —
    // see readCsv). Every space in the source text becomes a newline,
    // so each record spans many physical lines and the quoted-field
    // reassembly is what's under test end-to-end.
    "scan_csv_multiline" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_csv_ml_fixture/${Fixtures.key(s, s"$d/documents.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(11)) === 0)
          .select(col("doc_id"),
            translate(col("text"), " ", "\n").as("body"))
          .write.mode("overwrite").option("header", true).csv(tmp)
      }
      CsvIngest.readCsv(s, s"$tmp/*.csv", multiLine = true)
        .select("doc_id", "body")
    }),

    // XLSX source — the reference ships openpyxl (requirements.txt:9)
    // but never grew the reader (datapump.py:442 is CSV-only); this
    // closes that implied source with a zero-dependency JDK zip+StAX
    // parser. Fixture: THREE driver-written workbooks (xlsx is a small-
    // file format; the glob is the parallelism unit), shared-string
    // text cells, null event_types omitted (sparse refs), timestamps as
    // ISO strings through the same all-or-nothing inference as CSV
    "scan_xlsx" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_xlsx_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        val dir = Paths.get(tmp)
        Files.createDirectories(dir)
        val slice = Tables.events(s, d)
          // id cap bounds the fixture (and its collect) at ~7.7k rows at
          // ANY corpus scale — identical to the uncapped slice at the
          // driver SFs (ids are dense 0..N-1, N ≤ 1e5 there), and the
          // oracle carries the same cap, so the declared fixture is
          // O(1)-sized rather than corpus-proportional
          .filter(pmod(col("event_id"), lit(13)) === 0 &&
            col("event_id") < 100000)
          .select(col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            when(col("event_type") === "view", lit(null))
              .otherwise(col("event_type")).as("event_type"),
            col("value"))
          .collect() // bounded: the ~1/13 slice; fixture-build only
        (0 until 3).foreach { part =>
          val rows = slice.iterator
            .filter(_.getLong(0) % 3 == part)
            .map(r => Seq[Any](r.getLong(0), r.getString(1),
              r.getString(2), r.getDouble(3))).toSeq
          val out = new java.io.FileOutputStream(
            dir.resolve(s"part$part.xlsx").toFile)
          try graft.ingest.XlsxIngest.writeXlsx(
            Seq("event_id", "ts", "event_type", "value"), rows, out)
          finally out.close()
        }
        Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
      }
      graft.ingest.XlsxIngest.readXlsx(s, s"$tmp/*.xlsx")
        .select("event_id", "ts", "event_type", "value")
    }),

    // newest-first processing order with last-write-wins upsert precedence
    // (the reference's quirky-but-real semantics: newest file is processed
    // FIRST, so the oldest file's rows land LAST and win — datapump.py:426)
    "scan_order_mtime" -> ((s, d) => {
      val dir = Paths.get(s"${Fixtures.root}/graft_mtime_fixture")
      Files.createDirectories(dir)
      val files = Seq(
        ("f1.csv", "k,v\n1,10.5\n2,20.5\n", 1700000000000L),
        ("f2.csv", "k,v\n1,11.5\n", 1700000010000L),
        ("f3.csv", "k,v\n2,22.5\n3,33.5\n", 1700000020000L))
      files.foreach { case (name, content, mtime) =>
        val p = dir.resolve(name)
        Files.write(p, content.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        p.toFile.setLastModified(mtime)
      }
      val ordered = CsvIngest.listByMtimeDesc(s, s"$dir/*.csv")
      val stamped = ordered.zipWithIndex.map { case (p, rank) =>
        CsvIngest.readCsv(s, p).withColumn("__rank", lit(rank))
      }.reduce(_ unionByName _)
      Dedupe.keepLast(stamped, Seq("k"), col("__rank")).drop("__rank")
    }),

    // §2.1 scan_partition_prune — the 100 TB layout story: land data
    // hive-partitioned on the natural time key, so a day-scoped query
    // reads 1/30th of the corpus via partition pruning (the date filter
    // resolves against directory names, visible as PartitionFilters in
    // the physical plan — zero data files from other days are opened).
    "scan_partition_prune" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_part_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        Tables.events(s, d)
          .withColumn("event_date", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("event_date").parquet(tmp)
      }
      s.read.parquet(tmp)
        .filter(col("event_date") === lit("2024-01-15"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    }),

    // §2.6 z-order layout as a SERVED consumer (not spec-only): orders
    // lands once as a Layout.writeZOrdered(custkey × totalprice) fixture
    // — 64 z-run files, each a compact rectangle stack of the value
    // plane — and the query is a 2-D range rectangle over that layout.
    // BOTH predicates reach the parquet scan as PushedFilters
    // (ZOrderLayoutSpec pins this on the entry's own executed plan),
    // so row groups prune on min/max footers in the two dimensions at
    // once: the 100 TB shape where neither dimension is a partition
    // column but both cut the scan. Result is layout-invariant, so the
    // oracle is the same rectangle over the original table; cents sums
    // in exact integer math (cross-engine half-up floor(x*100+0.5)).
    "scan_zorder_prune" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_zorder_fixture/${Fixtures.key(s, s"$d/orders.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        graft.ops.Layout.writeZOrdered(Tables.orders(s, d),
          "o_custkey", "o_totalprice", numFiles = 64, tmp)
      }
      s.read.parquet(tmp)
        .filter(col("o_custkey").between(40, 90) &&
          col("o_totalprice").between(100000.0, 250000.0))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("sum_cents"))
    }),

    // §2.1 DYNAMIC partition pruning — static pruning's runtime sibling:
    // which partitions to read is decided by a DIM-side predicate
    // ("reprocess Mondays" against a calendar dim), so no literal date
    // filter exists for the planner to push into the fact scan. Spark
    // broadcasts the filtered dim and injects a dynamicpruning#N
    // subquery into the scan's PartitionFilters (DppSpec pins it in the
    // executed plan, reusing the join's broadcast — the probe costs no
    // extra scan). At 100 TB the fact scan opens the 5 Monday
    // directories, not all 30. Note the dim filter must be a SELECTIVE
    // predicate (a comparison) — Spark's PartitionPruning rule ignores
    // dims whose only filter is isnotnull (an agg/limit dim, say), a
    // planner contract this entry deliberately stays inside.
    "join_partition_prune" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_part_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        Tables.events(s, d)
          .withColumn("event_date", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("event_date").parquet(tmp)
      }
      val fact = s.read.parquet(tmp)
      val mondays = s.sql(
          "SELECT event_date, weekday(event_date) AS dow FROM (SELECT " +
          "explode(sequence(DATE'2024-01-01', DATE'2024-12-31')) " +
          "AS event_date)")
        .filter(col("dow") === 0)
      fact.join(broadcast(mondays), Seq("event_date"))
        .groupBy("event_date")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    }),

    // JSONL source — the dominant LLM-training-data interchange format.
    // Row-level quarantine (the reference moves WHOLE failing files to
    // problems/, datapump.py:648 — at scale one bad line must not dump a
    // terabyte file): PERMISSIVE parse splits clean rows from malformed
    // ones, keeping each bad line verbatim for the repair queue. Output
    // = clean rows + the quarantine count; literal-VALUES oracle pins
    // which lines are malformed vs merely null-valued.
    "scan_corrupt_quarantine" -> ((s, d) => {
      val dir = Paths.get(s"${Fixtures.root}/graft_quarantine_fixture")
      Files.createDirectories(dir)
      Files.write(dir.resolve("data.csv"),
        ("k,v,ts\n" +
          "1,10.5,2024-01-01 00:00:00\n" +          // clean
          "2,notanumber,2024-01-01 00:00:00\n" +    // bad: v unparseable
          "3,7.5\n" +                                // bad: short row
          ",,\n" +                                   // clean: all-null row
          "4,,2024-01-02 00:00:00\n" +               // clean: null v
          "5,5.5,2024-01-03 00:00:00,extra\n")       // bad: extra token
          .getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      val (good, bad) = CsvIngest.readCsvQuarantine(s,
        s"$dir/data.csv", schema)
      val nBad = bad.agg(count(lit(1)).as("n_quarantined"))
      good.select(col("k"), col("v"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .crossJoin(broadcast(nBad))
    }),

    // Round trip: events → to_json lines → schema-pinned spark.read.json.
    // A pinned schema (never inference) is the 100 TB contract: inference
    // would scan the corpus twice and can drift between files.
    "scan_jsonl" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_jsonl_fixture/${Fixtures.key(s, s"$d/events.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        Tables.events(s, d)
          .select(to_json(struct(col("event_id"), col("user_id"),
            col("event_type"), col("value"))).as("value"))
          .write.mode("overwrite").text(tmp)
      }
      s.read
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
        .json(tmp)
        .select("event_id", "user_id", "event_type", "value")
    }),

    // Schema evolution across landed files — years of ingested data drift
    // (columns added/retired); mergeSchema unions the footers and reads
    // absent columns as null. Fixture: two parquet files with overlapping
    // schemas ((k,a) and (k,b)).
    "scan_schema_merge" -> ((s, d) => {
      val tmp =
        s"${Fixtures.root}/graft_merge_fixture/${Fixtures.key(s, s"$d/region.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        val r = Tables.region(s, d)
        r.select(col("r_regionkey").as("k"), col("r_name").as("a"))
          .write.mode("overwrite").parquet(s"$tmp/part1")
        r.select(col("r_regionkey").as("k"),
            length(col("r_name")).cast("long").as("b"))
          .write.mode("overwrite").parquet(s"$tmp/part2")
        // one _SUCCESS at the fixture root marks both parts written
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.create(new org.apache.hadoop.fs.Path(s"$tmp/_SUCCESS")).close()
      }
      s.read.option("mergeSchema", true)
        .parquet(s"$tmp/part1", s"$tmp/part2")
        .select("k", "a", "b")
    }),

    // Small-files compaction: a 32-fragment landing dir (one file per
    // micro-batch is the streaming-ingest pathology) rewritten to few
    // size-targeted files; the oracle checks row-level identity with the
    // source table — compaction must be a pure layout change.
    "sink_compact" -> ((s, d) => {
      val key = Fixtures.key(s, s"$d/events.parquet")
      val frag = s"${Fixtures.root}/graft_compact_fixture/$key/fragmented"
      val out = s"${Fixtures.root}/graft_compact_fixture/$key/compacted"
      if (!Fixtures.exists(s, frag)) {
        Tables.events(s, d).select("event_id", "user_id", "value")
          .repartition(32).write.mode("overwrite").parquet(frag)
      }
      if (!Fixtures.exists(s, out)) {
        graft.ingest.Compaction.compact(s, frag, out,
          targetBytes = 512 * 1024)
      }
      s.read.parquet(out)
    }),

    // §2.2 project_drop_cols (reference Stat.DropColumns, datapump.py:291)
    "project_drop_cols" -> ((s, d) =>
      Tables.customer(s, d).drop("c_acctbal", "c_nationkey")),

    // §2.2 project_drop_first — drop the positional first column (the
    // datastore's internal _id, datapump.py:298)
    "project_drop_first" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.drop(c.columns.head)
    }),

    // §2.8 scalar_isnull — the sparse-record emit gate (datapump.py:318)
    "scalar_isnull" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        when(col("event_type") === "view", lit(null))
          .otherwise(col("event_type")).isNull.as("is_sparse"))),

    // §2.1 sink_upsert, logical form: incoming batch wins by PK
    "sink_upsert" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val existing = orders
        .filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // +1000.0 (exact IEEE add) rather than a rounded multiply: Spark's
      // round(double) goes through the shortest-decimal repr while DuckDB
      // rounds the binary value — they disagree on .xx5 boundaries.
      val incoming = orders
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
      SinkOps.logicalUpsert(existing, incoming, Seq("o_orderkey"))
    }),

    // §2.1 scan_orc: parquet → ORC → filtered read-back. ORC is Spark's
    // second built-in columnar format; the whole write→read→push-down
    // pipeline is under test (the oracle reads the parquet source). The
    // fixture is content-keyed like the CSV round-trips.
    "scan_orc" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_orc_fixture/${Fixtures.key(s, s"$d/orders.parquet")}"
      if (!Fixtures.exists(s, tmp))
        Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderdate")
          .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).filter(col("o_totalprice") > 50000.0)
    }),

    // §2.1 scan_avro: parquet → per-partition Avro container files →
    // read-back (avro-core directly; the offline build has no
    // spark-avro). File = read-parallelism unit, like xlsx; the writer
    // never produces the single-giant-file layout that would need
    // block splitting.
    "scan_avro" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_avro_fixture/${Fixtures.key(s, s"$d/orders.parquet")}"
      if (!Fixtures.exists(s, tmp)) {
        graft.ingest.AvroIngest.writeAvro(
          Tables.orders(s, d)
            .select("o_orderkey", "o_orderstatus", "o_totalprice"), tmp)
        // writeAvro lands raw part files; stamp the fixture complete
        val p = new org.apache.hadoop.fs.Path(s"$tmp/_SUCCESS")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .create(p, true).close()
      }
      graft.ingest.AvroIngest.readAvro(s, s"$tmp/part-*.avro")
        .filter(col("o_totalprice") > 50000.0)
    }),

    // §2.1 dynamic partition overwrite — the idempotent-backfill
    // primitive: rewrite ONLY the partitions present in the incoming
    // frame (status 'F' gets corrected prices), leaving sibling
    // partitions untouched. Re-running converges to the same layout
    // (the correction derives from the source, not the layout), which
    // is what makes partition-scoped backfills safe to retry at 100 TB.
    "sink_overwrite_dynamic" -> ((s, d) => {
      val tmp = s"${Fixtures.root}/graft_dynow_fixture/${Fixtures.key(s, s"$d/orders.parquet")}"
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      if (!Fixtures.exists(s, tmp))
        base.write.mode("overwrite")
          .partitionBy("o_orderstatus").parquet(tmp)
      base.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    }),

    // §2.1 CDC changelog apply: collapse an I/U/D change stream onto the
    // orders snapshot — latest change per key wins by (ts, seq). Branches
    // exercised: same-instant seq tie-break (%3: two U at ts=2, seq 2
    // wins), update-then-delete (%15: U@2 then D@3 → gone), delete-then-
    // resurrect (%11: D@1 then U@4 → survives with the U image; %55 keys
    // see D@3 vs U@4 → U wins), brand-new insert (%7 offset keys),
    // untouched snapshot keys pass through.
    "sink_cdc_apply" -> ((s, d) => {
      val snap = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      def chg(pred: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column,
          cust: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
          op: String, ts: Long, seq: Long) =
        snap.filter(pred).select(key.as("o_orderkey"), cust.as("o_custkey"),
          price.as("o_totalprice"), lit(op).as("op"),
          lit(ts).as("ts"), lit(seq).as("seq"))
      val k = col("o_orderkey")
      val nullC = lit(null).cast("bigint")
      val nullP = lit(null).cast("double")
      val changes =
        chg(k % 3 === 0, k, col("o_custkey"),
          col("o_totalprice") + 100.0, "U", 2L, 1L)
        .unionByName(chg(k % 3 === 0, k, col("o_custkey"),
          col("o_totalprice") + 200.0, "U", 2L, 2L))
        .unionByName(chg(k % 5 === 0, k, nullC, nullP, "D", 3L, 1L))
        .unionByName(chg(k % 11 === 0, k, nullC, nullP, "D", 1L, 1L))
        .unionByName(chg(k % 11 === 0, k, col("o_custkey"),
          col("o_totalprice") + 500.0, "U", 4L, 1L))
        .unionByName(chg(k % 7 === 0, k + 2000000L, col("o_custkey"),
          lit(1.0), "I", 2L, 1L))
      SinkOps.cdcApply(snap, changes, Seq("o_orderkey"), Seq("ts", "seq"))
    }),

    // §2.1 SCD TYPE-2 dimension merge: apply a customer-segment update
    // batch to a versioned dim, keeping history. The scenario exercises
    // every branch: %5 keys carry a pre-existing CLOSED version (must
    // pass through untouched), %3==0 keys change segment (current
    // version closes + new version born), %3==1 keys re-send their
    // current segment (change detection: NO new version), %7 keys
    // arrive offset by +1000000 (unseen: first open version).
    "sink_scd2" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val eff = lit("2025-06-01 00:00:00").cast("timestamp")
      val dim = c.select(col("c_custkey"), col("c_mktsegment"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          lit(true).as("is_current"))
        .unionByName(c.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"),
            concat(lit("OLD-"), col("c_mktsegment")).as("c_mktsegment"),
            lit("2023-01-01 00:00:00").cast("timestamp").as("valid_from"),
            lit("2024-01-01 00:00:00").cast("timestamp").as("valid_to"),
            lit(false).as("is_current")))
      val updates = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("-v2")).as("c_mktsegment"))
        .unionByName(c.filter(col("c_custkey") % 3 === 1)
          .select("c_custkey", "c_mktsegment"))
        .unionByName(c.filter(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            lit("NEW").as("c_mktsegment")))
      SinkOps.scd2Merge(dim, updates, Seq("c_custkey"),
        Seq("c_mktsegment"), eff)
    }),
  )

  def oracle: Map[String, String] = Map(
    "scan_csv_glob" ->
      """SELECT event_id,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
        |  CASE WHEN event_type = 'view' THEN NULL ELSE event_type END
        |    AS event_type,
        |  value
        |FROM events""".stripMargin,

    "scan_xlsx" ->
      """SELECT event_id,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
        |  CASE WHEN event_type = 'view' THEN NULL ELSE event_type END
        |    AS event_type,
        |  value
        |FROM events WHERE event_id % 13 = 0 AND event_id < 100000"""
        .stripMargin,

    "scan_csv_delim" ->
      """SELECT event_id,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts,
        |  event_type || ';é' AS tag,
        |  value
        |FROM events WHERE event_id % 7 = 0""".stripMargin,

    "scan_order_mtime" ->
      """SELECT CAST(k AS BIGINT) AS k, CAST(v AS DOUBLE) AS v
        |FROM (VALUES (1, 10.5), (2, 20.5), (3, 33.5)) AS t(k, v)"""
        .stripMargin,

    // the quoted-newline round trip must reproduce the rewritten text
    "scan_csv_multiline" ->
      """SELECT doc_id, replace(text, ' ', chr(10)) AS body
        |FROM documents WHERE doc_id % 11 = 0""".stripMargin,

    "scan_partition_prune" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        |GROUP BY event_type""".stripMargin,

    "join_partition_prune" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events WHERE isodow(CAST(ts AS DATE)) = 1
        |GROUP BY 1""".stripMargin,

    "scan_zorder_prune" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE o_custkey BETWEEN 40 AND 90
        |  AND o_totalprice BETWEEN 100000 AND 250000
        |GROUP BY o_orderstatus""".stripMargin,

    // literal oracle pins Spark's PERMISSIVE semantics: unparseable
    // field / short row / extra token ⇒ quarantine; all-null and
    // null-valued well-formed rows ⇒ clean
    "scan_corrupt_quarantine" ->
      """SELECT CAST(k AS BIGINT) AS k, CAST(v AS DOUBLE) AS v,
        |  CAST(ts_str AS VARCHAR) AS ts_str,
        |  CAST(3 AS BIGINT) AS n_quarantined
        |FROM (VALUES
        |  (1, 10.5, '2024-01-01 00:00:00'),
        |  (NULL, NULL, NULL),
        |  (4, NULL, '2024-01-02 00:00:00')) AS t(k, v, ts_str)"""
        .stripMargin,

    // double round-trip through JSON shortest-decimal repr is exact, so
    // the oracle is the source table itself
    "scan_jsonl" ->
      "SELECT event_id, user_id, event_type, value FROM events",

    // compaction is a pure layout change: row content identical to source
    "sink_compact" ->
      "SELECT event_id, user_id, value FROM events",

    // each source file contributes its own columns; the other file's rows
    // carry null there
    "scan_schema_merge" ->
      """SELECT r_regionkey AS k, r_name AS a, CAST(NULL AS BIGINT) AS b
        |FROM region
        |UNION ALL
        |SELECT r_regionkey AS k, CAST(NULL AS VARCHAR) AS a,
        |  CAST(length(r_name) AS BIGINT) AS b
        |FROM region""".stripMargin,

    "project_drop_cols" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",

    "project_drop_first" ->
      "SELECT c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",

    "scalar_isnull" ->
      """SELECT event_id, event_type = 'view' AS is_sparse FROM events""",

    "sink_upsert" ->
      """WITH old AS (SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |new AS (SELECT o_orderkey, o_custkey,
        |    o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT * FROM new
        |UNION ALL
        |SELECT * FROM old
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM new)""".stripMargin,

    // F rows corrected, sibling partitions byte-identical to the source
    "sink_overwrite_dynamic" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 10.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        |FROM orders""".stripMargin,

    // the Avro round-trip must reproduce the parquet source exactly
    "scan_avro" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_totalprice > 50000.0""".stripMargin,

    // the ORC round-trip must reproduce the parquet source exactly
    "scan_orc" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders WHERE o_totalprice > 50000.0""".stripMargin,

    // same changelog, collapsed with the identical window + branch unions
    "sink_cdc_apply" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
        |    'U' AS op, 2 AS ts, 1 AS seq FROM snap WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 200.0, 'U', 2, 2
        |  FROM snap WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |    'D', 3, 1 FROM snap WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |    'D', 1, 1 FROM snap WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 500.0, 'U', 4, 1
        |  FROM snap WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 2000000, o_custkey, 1.0, 'I', 2, 1
        |  FROM snap WHERE o_orderkey % 7 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY ts DESC, seq DESC) AS rn
        |    FROM chg) WHERE rn = 1)
        |SELECT s.* FROM snap s
        |WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM latest
        |WHERE op <> 'D'""".stripMargin,

    // same scenario, merge spelled as explicit branch unions; IS DISTINCT
    // FROM mirrors the Spark null-safe change test
    "sink_scd2" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment,
        |    TIMESTAMP '2024-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'OLD-' || c_mktsegment,
        |    TIMESTAMP '2023-01-01', TIMESTAMP '2024-01-01', false
        |  FROM customer WHERE c_custkey % 5 = 0),
        |upd AS (
        |  SELECT c_custkey, c_mktsegment || '-v2' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NEW' FROM customer
        |  WHERE c_custkey % 7 = 0),
        |cur AS (SELECT * FROM dim WHERE is_current),
        |chg AS (
        |  SELECT u.c_custkey, u.c_mktsegment FROM upd u
        |  JOIN cur c ON u.c_custkey = c.c_custkey
        |  WHERE u.c_mktsegment IS DISTINCT FROM c.c_mktsegment),
        |brand_new AS (
        |  SELECT u.c_custkey, u.c_mktsegment FROM upd u
        |  WHERE u.c_custkey NOT IN (SELECT c_custkey FROM dim))
        |SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current
        |FROM dim WHERE NOT is_current
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, valid_from,
        |  CAST(NULL AS TIMESTAMP), true
        |FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
        |UNION ALL
        |SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
        |  TIMESTAMP '2025-06-01', false
        |FROM cur c JOIN chg ON c.c_custkey = chg.c_custkey
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, TIMESTAMP '2025-06-01',
        |  CAST(NULL AS TIMESTAMP), true
        |FROM chg
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, TIMESTAMP '2025-06-01',
        |  CAST(NULL AS TIMESTAMP), true
        |FROM brand_new""".stripMargin,
  )
}
