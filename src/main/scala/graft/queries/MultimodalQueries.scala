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

    // REAL ImageIO decode over synthetic PNGs whose pixels are closed-form
    // in doc_id (Multimodal.syntheticPng) — the oracle predicts the decoded
    // width/height/channel sums without any codec, so the whole
    // encode→decode→feature path is hash-checked. n_bytes is projected
    // away (PNG compressed size is not closed-form).
    "mm_decode_image" -> ((s, d) =>
      Multimodal.decodeImage(s,
        Multimodal.imageFixture(s, Tables.documents(s, d), "doc_id",
          w = 16, h = 16, constant = false))
        .toDF().select("doc_id", "is_image", "width", "height",
          "sum_r", "sum_g", "sum_b")),

    // image PERCEPTUAL-HASH dedup: real ImageIO decode → integer-luma
    // difference hash (bit y·8+x set when luma(x+1,y) > luma(x,y)) →
    // hash-bucket group count — the image twin of the text fingerprint
    // dedup family. The gradient fixture's luma is closed-form in
    // doc_id, so the oracle predicts all 64 bits without a codec; the
    // hash comes back as two non-negative 32-bit halves (no
    // two's-complement edge for the SQL side)
    "mm_image_dhash" -> ((s, d) => {
      val h = Multimodal.dHash(s,
        Multimodal.imageFixture(s, Tables.documents(s, d), "doc_id",
          w = 16, h = 16, constant = false)).toDF()
      val counts = h.groupBy("dhash_hi", "dhash_lo")
        .agg(count(lit(1)).as("n_same_hash"))
      h.join(counts, Seq("dhash_hi", "dhash_lo"))
        .select("doc_id", "dhash_hi", "dhash_lo", "n_same_hash")
    }),

    // image near-dup PAIRS: banded hamming join over the dhash (16-bit
    // chunk pigeonhole — exact for hamming ≤ 3, never all-pairs); only
    // (id, hash, chunk) rows shuffle, never image bytes. Oracle is the
    // brute-force closed-form pair join. The gradient corpus is
    // adversarially hash-DENSE (every image near-dups thousands:
    // 4.2M pairs at sf0.1), so the entry runs a 1-in-10 slice — the
    // banding plan is identical, the pair count stays representative
    "mm_image_neardup" -> ((s, d) =>
      Multimodal.dHashPairs(
        Multimodal.dHash(s,
          Multimodal.imageFixture(s,
            Tables.documents(s, d).filter(pmod(col("doc_id"), lit(10)) === 0),
            "doc_id", w = 16, h = 16, constant = false)).toDF())),

    // non-image payloads take the deterministic fallback branch of the
    // SAME operator (is_image=false, head-byte sum) — the mixed-corpus
    // totality contract, oracle-checked
    "mm_decode_fallback" -> ((s, d) =>
      Multimodal.decodeImage(s,
        Multimodal.withBinary(Tables.documents(s, d), "doc_id", "text"))
        .toDF().select(col("doc_id"), col("n_bytes"), col("is_image"),
          col("sum_r").as("feat"))),

    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(Tables.documents(s, d), "doc_id", "text", 32)),

    // REAL PCM16-LE decode over synthetic waveforms whose samples are
    // closed-form in doc_id (Multimodal.audioFixture) — byte-level
    // little-endian short parsing on the Spark side, formula-predicted
    // integer stats on the oracle side; no codec, no float drift.
    "mm_audio_stats" -> ((s, d) =>
      Multimodal.decodeAudio(s,
        Multimodal.audioFixture(s, Tables.documents(s, d), "doc_id"))
        .toDF()),

    // REAL Graphics2D resize: constant-color PNGs (invariant under any
    // resampling kernel) → 16×16 decoded, scaled to 8×8, PNG re-encoded,
    // decoded AGAIN — the oracle predicts the post-resize channel sums
    // exactly (64 × the doc's color).
    "mm_resize_image" -> ((s, d) =>
      Multimodal.decodeImage(s,
        Multimodal.resizeImage(s,
          Multimodal.imageFixture(s, Tables.documents(s, d), "doc_id",
            w = 16, h = 16, constant = true),
          targetW = 8, targetH = 8, targetBytes = 96).toDF())
        .toDF().select("doc_id", "is_image", "width", "height",
          "sum_r", "sum_g", "sum_b")),

    // non-image payloads: truncation fallback of the same resize operator
    "mm_resize_fallback" -> ((s, d) =>
      Multimodal.resizeImage(s,
        Multimodal.withBinary(Tables.documents(s, d), "doc_id", "text"),
        targetW = 8, targetH = 8, targetBytes = 96)
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

    // gradient image: pixel i has r=(id+i)%251, g=(7id+3i)%251,
    // b=(13id+5i)%239 over i in 0..255 — the decoded channel sums are
    // these closed forms (PNG is lossless)
    "mm_decode_image" ->
      """SELECT doc_id, TRUE AS is_image, 16 AS width, 16 AS height,
        |  CAST(list_sum(list_transform(range(0, 256),
        |    i -> (doc_id + i) % 251)) AS BIGINT) AS sum_r,
        |  CAST(list_sum(list_transform(range(0, 256),
        |    i -> (doc_id * 7 + i * 3) % 251)) AS BIGINT) AS sum_g,
        |  CAST(list_sum(list_transform(range(0, 256),
        |    i -> (doc_id * 13 + i * 5) % 239)) AS BIGINT) AS sum_b
        |FROM documents""".stripMargin,

    // same closed-form pixels, reduced to integer luma
    // (299r+587g+114b)//1000; list L is 1-based (L[i+1] = luma of
    // 0-based pixel i); bit b compares pixel (b//8)*16+(b%8) with its
    // right neighbor
    "mm_image_dhash" ->
      """WITH lum AS (
        |  SELECT doc_id, list_transform(range(0, 256), i ->
        |    (299 * ((doc_id + i) % 251)
        |     + 587 * ((doc_id * 7 + i * 3) % 251)
        |     + 114 * ((doc_id * 13 + i * 5) % 239)) // 1000) AS L
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(32, 64), b ->
        |      CASE WHEN L[(b // 8) * 16 + (b % 8) + 2]
        |                 > L[(b // 8) * 16 + (b % 8) + 1]
        |        THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END))
        |      AS BIGINT) AS dhash_hi,
        |    CAST(list_sum(list_transform(range(0, 32), b ->
        |      CASE WHEN L[(b // 8) * 16 + (b % 8) + 2]
        |                 > L[(b // 8) * 16 + (b % 8) + 1]
        |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
        |      AS BIGINT) AS dhash_lo
        |  FROM lum)
        |SELECT doc_id, dhash_hi, dhash_lo,
        |  count(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS n_same_hash
        |FROM h""".stripMargin,

    // brute-force pair join over the same closed-form hashes (oracle-SF
    // tractable; the engine side bands instead)
    "mm_image_neardup" ->
      """WITH lum AS (
        |  SELECT doc_id, list_transform(range(0, 256), i ->
        |    (299 * ((doc_id + i) % 251)
        |     + 587 * ((doc_id * 7 + i * 3) % 251)
        |     + 114 * ((doc_id * 13 + i * 5) % 239)) // 1000) AS L
        |  FROM documents WHERE doc_id % 10 = 0),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(32, 64), b ->
        |      CASE WHEN L[(b // 8) * 16 + (b % 8) + 2]
        |                 > L[(b // 8) * 16 + (b % 8) + 1]
        |        THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END))
        |      AS BIGINT) AS hi,
        |    CAST(list_sum(list_transform(range(0, 32), b ->
        |      CASE WHEN L[(b // 8) * 16 + (b % 8) + 2]
        |                 > L[(b // 8) * 16 + (b % 8) + 1]
        |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
        |      AS BIGINT) AS lo
        |  FROM lum)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.hi, b.hi))
        |       + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |""".stripMargin,

    // CAST(list_sum AS BIGINT): DuckDB's list_sum returns HUGEINT, which
    // pandas renders as float ("696.0") vs Spark's BIGINT ("696")
    "mm_decode_fallback" ->
      """SELECT doc_id, length(text) AS n_bytes, FALSE AS is_image,
        |  CAST(list_sum(list_transform(string_split(substring(text, 1, 8), ''),
        |    c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS feat
        |FROM documents""".stripMargin,

    // constant-color 16×16 → 8×8: any resampling kernel preserves the
    // color, so each 8×8 channel sum is 64 × the doc's color
    "mm_resize_image" ->
      """SELECT doc_id, TRUE AS is_image, 8 AS width, 8 AS height,
        |  CAST(64 * (doc_id % 251) AS BIGINT) AS sum_r,
        |  CAST(64 * ((doc_id * 7) % 251) AS BIGINT) AS sum_g,
        |  CAST(64 * ((doc_id * 13) % 239) AS BIGINT) AS sum_b
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

    // the audioFixture closed form, re-derived without touching bytes:
    // n = 64 + id%64 samples, s_i = ((id*7 + i*13) % 199) - 99
    "mm_audio_stats" ->
      """WITH s AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
        |samp AS (SELECT doc_id, ((doc_id * 7 + i * 13) % 199) - 99 AS v
        |         FROM s, unnest(range(0, n)) AS t(i))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_amp,
        |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM samp GROUP BY doc_id""".stripMargin,

    // octet_length(encode(...)), not length(...): the Spark side truncates
    // the UTF-8 payload at 96 BYTES, so the oracle must count bytes too or
    // parity silently depends on the corpus being pure ASCII
    "mm_resize_fallback" ->
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
