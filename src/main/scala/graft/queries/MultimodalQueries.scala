package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Multimodal
import graft.sink.JdbcSink

/** Multimodal plumbing queries + remaining §2.1 sink inventory ops
  * (record count, sparse JSON records, physical sink round-trips backed by
  * an in-memory Derby database at query time).
  */
object MultimodalQueries extends QueryPack {

  def queries: Map[String, Q] = Map(
    "mm_binary_meta" -> ((s, d) =>
      Multimodal.withBinary(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.mime").as("mime"))),

    "mm_decode_stub" -> ((s, d) =>
      Multimodal.decodeStub(s,
        Multimodal.withBinary(Tables.documents(s, d), "doc_id", "text"))
        .toDF()),

    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(Tables.documents(s, d), "doc_id", "text", 32)),

    "mm_resize_stub" -> ((s, d) =>
      Multimodal.resizeStub(s,
        Multimodal.withBinary(Tables.documents(s, d), "doc_id", "text"), 96)
        .toDF().select(col("doc_id"), col("n_bytes"))),

    // §2.4 agg_record_count (datapump.py:565 calculate_record_count)
    "agg_record_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))),

    // §2.1 sink_records_json: sparse record serialization — null fields
    // are DROPPED (to_json default), the reference's to_dict + null strip
    // (datapump.py:314-320)
    "sink_records_json" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        to_json(struct(col("event_id"),
          when(col("event_type") === "view", lit(null))
            .otherwise(col("event_type")).as("event_type")))
          .as("record"))),

    // §2.1 scan_http_csv analog: push a slice into a real JDBC table and
    // read it back through the sink (the reference re-downloads the whole
    // resource for stats, datapump.py:375-376)
    "scan_http_csv" -> ((s, d) => {
      val sink = JdbcSink("jdbc:derby:memory:verifyrt;create=true")
      val slice = Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      sink.ensureTable("rt_orders", slice.schema, Seq("o_orderkey"))
      sink.upsert(slice, "rt_orders", Seq("o_orderkey"))
      // read back cast to the pre-sink schema: Derby TIMESTAMP surfaces as
      // TimestampType while the source column is TimestampNTZ
      sink.readBack(s, "rt_orders", slice.schema)
    }),

    // §2.1 sink_truncate: truncate between loads — only the second load
    // survives
    "sink_truncate" -> ((s, d) => {
      val sink = JdbcSink("jdbc:derby:memory:verifytr;create=true")
      val first = Tables.region(s, d)
      val second = Tables.nation(s, d)
        .select(col("n_nationkey").as("r_regionkey"),
          col("n_name").as("r_name"))
      sink.ensureTable("tr_t", first.schema, Seq("r_regionkey"))
      sink.upsert(first, "tr_t", Seq("r_regionkey"))
      sink.truncate("tr_t")
      sink.upsert(second, "tr_t", Seq("r_regionkey"))
      sink.readBack(s, "tr_t")
    }),
  )

  def oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, length(text) AS n_bytes, 'text/plain' AS mime
        |FROM documents""".stripMargin,

    // CAST(list_sum AS BIGINT): DuckDB's list_sum returns HUGEINT, which
    // pandas renders as float ("696.0") vs Spark's BIGINT ("696")
    "mm_decode_stub" ->
      """SELECT doc_id, length(text) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(substring(text, 1, 8), ''),
        |    c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS feat
        |FROM documents""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substring(text, CAST(i*32+1 AS INT), 32), ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS frame_fp
        |FROM documents,
        |  unnest(range(0, CAST(ceil(length(text) / 32.0) AS BIGINT))) AS t(i)"""
        .stripMargin,

    // octet_length(encode(...)), not length(...): the Spark side truncates
    // the UTF-8 payload at 96 BYTES, so the oracle must count bytes too or
    // parity silently depends on the corpus being pure ASCII
    "mm_resize_stub" ->
      """SELECT doc_id, least(octet_length(encode(text)), 96) AS n_bytes
        |FROM documents""".stripMargin,

    "agg_record_count" -> "SELECT count(*) AS n FROM lineitem",

    "sink_records_json" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'view'
        |    THEN '{"event_id":' || event_id || '}'
        |    ELSE '{"event_id":' || event_id ||
        |      ',"event_type":"' || event_type || '"}' END AS record
        |FROM events""".stripMargin,

    "scan_http_csv" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "sink_truncate" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS r_regionkey, n_name AS r_name
        |FROM nation""".stripMargin,
  )
}
