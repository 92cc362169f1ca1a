package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY §2.8): multi-format timestamp parsing
  * (the reference's `dateparser` loop, `datapump.py:439-444`, re-expressed
  * as a codegen'd `coalesce(try_to_timestamp...)` chain), timestamp
  * formatting, the `(UPDATED: ts)` description regex, and the NS
  * string/date/math/json/array function families.
  */
object ScalarQueries extends QueryPack {

  // The reference's 4 default date formats (datapump.py:89-92), in try
  // order; graft.ops.Timestamps adds the bounded deterministic
  // fuzzy-fallback tier (the dateparser analog — SURVEY §2.8; remaining
  // deviation is natural-language dates only).
  private val sparkFmts = graft.ops.Timestamps.DeclaredFormats.map(_._1)

  // the fuzzy fixture cycles through formats NONE of the declared four
  // match — every parse below resolves in the fallback tier
  private val fuzzyFixture = Seq(
    "yyyy-MM-dd", "MM/dd/yyyy", "dd MMM yyyy HH:mm:ss",
    "MMM dd, yyyy", "yyyy/MM/dd HH:mm:ss", "yyyyMMdd")

  def queries: Map[String, Q] = Map(
    // Round-trip: format each event ts into one of 4 formats (picked by
    // event_id % 4), then recover it with the ordered try-parse chain
    // (declared formats first — the fuzzy tier never fires here).
    "scalar_parse_ts" -> ((s, d) => {
      val raw = Tables.events(s, d).withColumn("ts_str",
        when(pmod(col("event_id"), lit(4)) === 0,
          date_format(col("ts"), sparkFmts(0)))
        .when(pmod(col("event_id"), lit(4)) === 1,
          date_format(col("ts"), sparkFmts(1)))
        .when(pmod(col("event_id"), lit(4)) === 2,
          date_format(col("ts"), sparkFmts(2)))
        .otherwise(date_format(col("ts"), sparkFmts(3))))
      raw.select(col("event_id"), col("ts_str"),
        graft.ops.Timestamps.parseTs(col("ts_str")).as("parsed"))
    }),

    // The dateparser-fallback tier (datapump.py:439-444): strings in six
    // formats the declared chain does NOT cover — date-only (midnight),
    // US month-first, English month names, compact basic — all recovered
    // by the extended chain. Deterministic, codegen'd, no UDF.
    "scalar_parse_ts_fuzzy" -> ((s, d) => {
      val cases = fuzzyFixture.zipWithIndex
      val raw = Tables.events(s, d).withColumn("ts_str",
        cases.tail.foldLeft(
          when(pmod(col("event_id"), lit(cases.length)) === cases.head._2,
            date_format(col("ts"), cases.head._1))) { case (acc, (f, i)) =>
          acc.when(pmod(col("event_id"), lit(cases.length)) === i,
            date_format(col("ts"), f))
        })
      raw.select(col("event_id"), col("ts_str"),
        graft.ops.Timestamps.parseTs(col("ts_str")).as("parsed"))
    }),

    // The natural-language tier behind its flag (the parseTsNl entry
    // point): relative-day words resolve against a PINNED anchor date;
    // full-month-name layouts parse in the NL/fuzzy tiers. The
    // `parsed_no_nl` column runs the SAME strings through the flag-OFF
    // chain — relative words must stay null there, so the oracle hash
    // pins both the new tier's semantics AND that existing entries are
    // untouched by it.
    "scalar_parse_ts_nl" -> ((s, d) => {
      val anchor = to_date(lit("2024-06-15"))
      val raw = Tables.events(s, d).withColumn("ts_str",
        when(pmod(col("event_id"), lit(5)) === 0, lit("yesterday"))
        .when(pmod(col("event_id"), lit(5)) === 1, lit("Today"))
        .when(pmod(col("event_id"), lit(5)) === 2, lit("tomorrow"))
        .when(pmod(col("event_id"), lit(5)) === 3,
          date_format(col("ts"), "dd MMMM yyyy"))
        .otherwise(date_format(col("ts"), "MMMM dd, yyyy")))
      raw.select(col("event_id"), col("ts_str"),
        graft.ops.Timestamps.parseTsNl(col("ts_str"), anchor).as("parsed"),
        graft.ops.Timestamps.parseTs(col("ts_str")).as("parsed_no_nl"))
    }),

    "scalar_ts_format" -> ((s, d) =>
      Tables.events(s, d).select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))),

    // The reference's resource-description stamp handling
    // (datapump.py:614-630): strip a prior ' (UPDATED: ...)' suffix and
    // extract the stamp.
    "scalar_regex_desc" -> ((s, d) => {
      val desc = concat(col("event_type"),
        lit(" (UPDATED: "), date_format(col("ts"), "yyyy-MM-dd"), lit(")"))
      Tables.events(s, d).select(
        col("event_id"),
        regexp_replace(desc, " \\(UPDATED: .*\\)$", "").as("base_desc"),
        regexp_extract(desc, " \\(UPDATED: (.*)\\)$", 1).as("stamp"))
    }),

    "string_funcs" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        upper(col("lang")).as("lang_up"),
        length(col("text")).cast("long").as("t_len"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        concat(col("lang"), lit(":"), col("source")).as("tag"),
        substring(col("text"), 1, 20).as("head20"))),

    "date_funcs" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        date_trunc("month", col("o_orderdate")).as("month_start"))),

    "math_funcs" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        floor(col("l_extendedprice")).as("floor_price"))),

    "json_get" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // URL decomposition — the log-ingest scalar family (host / path /
    // one query parameter). URLs are synthesized from event columns so
    // the oracle can rebuild every component with string concatenation
    // instead of re-implementing a URL parser.
    "scalar_url" -> ((s, d) => {
      val url = concat(lit("https://data.example.com/"), col("event_type"),
        lit("/"), col("event_id"), lit("?user="), col("user_id"),
        lit("&v=2"))
      Tables.events(s, d).select(
        col("event_id"), url.as("url"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("user")).as("user_param"))
    }),

    "array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(element_at(col("embedding"), 1).cast("double"), 6)
          .as("first_val"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x), 4).as("vec_sum"))),

    // Morton z-order kernel (ops.Layout): min-max grid-scale two
    // dimensions to 16 bits and interleave — the clustering key behind
    // writeZOrdered's 2-D row-group skipping (measured in
    // ZOrderLayoutSpec). Map-only over one broadcast bounds row; the
    // oracle spells the identical shift/and/or tree in SQL.
    "scalar_zorder" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val b = o.agg(
        min(col("o_custkey")).cast("double").as("xlo"),
        max(col("o_custkey")).cast("double").as("xhi"),
        min(col("o_totalprice")).cast("double").as("ylo"),
        max(col("o_totalprice")).cast("double").as("yhi"))
      val g = o.crossJoin(broadcast(b)).select(col("o_orderkey"),
        graft.ops.Layout.gridScale(col("o_custkey"),
          col("xlo"), col("xhi"), 16).as("zx"),
        graft.ops.Layout.gridScale(col("o_totalprice"),
          col("ylo"), col("yhi"), 16).as("zy"))
      g.select(col("o_orderkey"), col("zx"), col("zy"),
        graft.ops.Layout.zValue(col("zx"), col("zy"), 16).as("zval"))
    }),

    // URL-level dedupe — the C4/CCNet frontier-collapse stage that runs
    // BEFORE any document is fetched twice: canonicalize (drop fragment,
    // strip utm_* tracking params keeping others in order, lowercase
    // scheme://host, drop default ports, strip trailing slashes) and
    // keep-first by canonical form. The fixture plants every variant
    // class from event parities (case/port/slash/utm/fragment), so each
    // canonical group collapses 1-to-many and non-utm params (`ref=`)
    // survive — the oracle replays the identical rule chain (split →
    // list_filter → rejoin; no lookbehind, RE2-safe). Map-only
    // canonicalization; the only shuffle is the canonical-key groupBy
    // carrying (url, id) rows — document/page bodies never move.
    "dedupe_url" -> ((s, d) => {
      val id = col("event_id")
      val dirty = concat(
        when(pmod(id, lit(2)) === 0, lit("HTTPS://Data.Example.COM"))
          .otherwise(lit("https://data.example.com")),
        when(pmod(id, lit(3)) === 0, lit(":443")).otherwise(lit("")),
        lit("/"), col("event_type"), lit("/item/"),
        pmod(id, lit(40)).cast("string"),
        when(pmod(id, lit(2)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(id, lit(3)) === 0,
          lit("?utm_source=feed&utm_campaign=daily"))
          .when(pmod(id, lit(3)) === 1, lit("?ref=home&utm_medium=social"))
          .otherwise(lit("")),
        when(pmod(id, lit(5)) === 0, lit("#section-2")).otherwise(lit("")))
      Tables.events(s, d)
        .select(id, graft.ops.TextOps.canonicalizeUrl(dirty).as("url"))
        .groupBy("url").agg(count(lit(1)).as("n_variants"),
          min("event_id").as("first_event_id"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "scalar_parse_ts" ->
      s"""WITH raw AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 4 AS INT)
        |      WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |      WHEN 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
        |      WHEN 2 THEN strftime(ts, '%d.%m.%Y %H:%M:%S')
        |      ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS ts_str
        |  FROM events)
        |SELECT event_id, ts_str,
        |  ${graft.ops.Timestamps.parseTsOracleSql("ts_str")} AS parsed
        |FROM raw""".stripMargin,

    // strftime patterns mirror fuzzyFixture in order; the parse chain is
    // generated from the SAME table as the Spark chain (order-identical)
    "scalar_parse_ts_fuzzy" ->
      s"""WITH raw AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 6 AS INT)
        |      WHEN 0 THEN strftime(ts, '%Y-%m-%d')
        |      WHEN 1 THEN strftime(ts, '%m/%d/%Y')
        |      WHEN 2 THEN strftime(ts, '%d %b %Y %H:%M:%S')
        |      WHEN 3 THEN strftime(ts, '%b %d, %Y')
        |      WHEN 4 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
        |      ELSE strftime(ts, '%Y%m%d') END AS ts_str
        |  FROM events)
        |SELECT event_id, ts_str,
        |  ${graft.ops.Timestamps.parseTsOracleSql("ts_str")} AS parsed
        |FROM raw""".stripMargin,

    // NL fixture mirrored in order; both parse chains generated from the
    // same tables as the Spark side ("Today" exercises case-folding)
    "scalar_parse_ts_nl" ->
      s"""WITH raw AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 5 AS INT)
        |      WHEN 0 THEN 'yesterday'
        |      WHEN 1 THEN 'Today'
        |      WHEN 2 THEN 'tomorrow'
        |      WHEN 3 THEN strftime(ts, '%d %B %Y')
        |      ELSE strftime(ts, '%B %d, %Y') END AS ts_str
        |  FROM events)
        |SELECT event_id, ts_str,
        |  ${graft.ops.Timestamps.parseTsNlOracleSql("ts_str",
             "DATE '2024-06-15'")} AS parsed,
        |  ${graft.ops.Timestamps.parseTsOracleSql("ts_str")} AS parsed_no_nl
        |FROM raw""".stripMargin,

    "scalar_ts_format" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM events""".stripMargin,

    "scalar_regex_desc" ->
      """WITH d AS (
        |  SELECT event_id,
        |    event_type || ' (UPDATED: ' || strftime(ts, '%Y-%m-%d') || ')'
        |      AS descr
        |  FROM events)
        |SELECT event_id,
        |  regexp_replace(descr, ' \(UPDATED: .*\)$', '') AS base_desc,
        |  regexp_extract(descr, ' \(UPDATED: (.*)\)$', 1) AS stamp
        |FROM d""".stripMargin,

    "string_funcs" ->
      """SELECT doc_id, upper(lang) AS lang_up,
        |  length(text) AS t_len,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  lang || ':' || source AS tag,
        |  substring(text, 1, 20) AS head20
        |FROM documents""".stripMargin,

    "date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(abs(l_discount - 0.05), 6) AS abs_disc,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price
        |FROM lineitem""".stripMargin,

    "json_get" ->
      """SELECT event_id,
        |  TRY_CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
        |    AS BIGINT) AS k
        |FROM events""".stripMargin,

    "scalar_url" ->
      """SELECT event_id,
        |  'https://data.example.com/' || event_type || '/' || event_id
        |    || '?user=' || user_id || '&v=2' AS url,
        |  'data.example.com' AS host,
        |  '/' || event_type || '/' || event_id AS path,
        |  CAST(user_id AS VARCHAR) AS user_param
        |FROM events""".stripMargin,

    "array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS n_dims,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |  round(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE))), 4) AS vec_sum
        |FROM embeddings""".stripMargin,

    // identical IEEE arithmetic order as Layout.gridScale, identical
    // shift/and/or interleave as Layout.zValue
    "scalar_zorder" -> {
      val inter = (0 until 16).map(i =>
        s"(((zx >> $i) & 1) << ${2 * i}) | " +
          s"(((zy >> $i) & 1) << ${2 * i + 1})").mkString(" | ")
      s"""WITH b AS (SELECT
         |    CAST(min(o_custkey) AS DOUBLE) AS xlo,
         |    CAST(max(o_custkey) AS DOUBLE) AS xhi,
         |    CAST(min(o_totalprice) AS DOUBLE) AS ylo,
         |    CAST(max(o_totalprice) AS DOUBLE) AS yhi
         |  FROM orders),
         |g AS (SELECT o_orderkey,
         |    least(65535, CAST(floor((CAST(o_custkey AS DOUBLE) - xlo)
         |      / (xhi - xlo) * 65535) AS BIGINT)) AS zx,
         |    least(65535, CAST(floor((CAST(o_totalprice AS DOUBLE) - ylo)
         |      / (yhi - ylo) * 65535) AS BIGINT)) AS zy
         |  FROM orders, b)
         |SELECT o_orderkey, zx, zy, ($inter) AS zval FROM g""".stripMargin
    },

    // the identical canonicalization rule chain: split_part for
    // fragment/query, list_filter for utm_* (keeps param order),
    // lowercase + default-port drop on the scheme://host prefix only,
    // trailing-slash strip on the path
    "dedupe_url" ->
      """WITH u AS (SELECT event_id,
        |  (CASE WHEN event_id % 2 = 0 THEN 'HTTPS://Data.Example.COM'
        |        ELSE 'https://data.example.com' END)
        |  || (CASE WHEN event_id % 3 = 0 THEN ':443' ELSE '' END)
        |  || '/' || event_type || '/item/' || CAST(event_id % 40 AS VARCHAR)
        |  || (CASE WHEN event_id % 2 = 0 THEN '/' ELSE '' END)
        |  || (CASE WHEN event_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=daily'
        |           WHEN event_id % 3 = 1 THEN '?ref=home&utm_medium=social'
        |           ELSE '' END)
        |  || (CASE WHEN event_id % 5 = 0 THEN '#section-2' ELSE '' END)
        |  AS dirty FROM events),
        |p AS (SELECT event_id,
        |    split_part(split_part(dirty, '#', 1), '?', 1) AS base,
        |    array_to_string(list_filter(
        |      string_split(split_part(split_part(dirty, '#', 1), '?', 2), '&'),
        |      q -> len(q) > 0 AND NOT starts_with(q, 'utm_')), '&') AS q
        |  FROM u),
        |c AS (SELECT event_id,
        |    regexp_replace(lower(
        |      regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*')),
        |      ':(443|80)$', '')
        |    || regexp_replace(substr(base, length(
        |      regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*')) + 1),
        |      '/+$', '')
        |    || (CASE WHEN len(q) > 0 THEN '?' || q ELSE '' END) AS url
        |  FROM p)
        |SELECT url, count(*) AS n_variants, min(event_id) AS first_event_id
        |FROM c GROUP BY 1""".stripMargin,
  )
}
