package graft.queries

import graft.Tables
import graft.ops.Stats

/** The reference's stats surface (SURVEY §2.4): describe + tie-faithful
  * mode, as driver-checkable queries.
  */
object StatsQueries extends QueryPack {

  private val descCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def queries: Map[String, Q] = Map(
    "agg_describe" -> ((s, d) =>
      Stats.describe(Tables.lineitem(s, d), descCols)),

    "agg_mode" -> ((s, d) =>
      Stats.modeAll(Tables.events(s, d), Seq("event_type", "user_id"))),

    // describe over a TIMESTAMP column — the reference's
    // datetime_is_numeric=True semantics (datapump.py:331-336): mean/
    // min/max are meaningful on the time axis. The mean uses EXACT
    // integer math (epoch-second sum + integer floor division) — a
    // double `avg` over epoch values accumulates summation-order error
    // of ~100 µs at 1e5 rows, which an exact-equality oracle cannot
    // tolerate.
    "agg_describe_ts" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.events(s, d).agg(
        count(col("ts")).as("n"),
        expr("timestamp_seconds(sum(unix_seconds(ts)) div count(ts))")
          .as("mean_ts"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "agg_describe" -> {
      val cs = descCols
      def row(label: String, f: String => String) =
        s"SELECT '$label' AS stat, " +
          cs.map(c => s"${f(c)} AS $c").mkString(", ") + " FROM lineitem"
      Seq(
        row("count", c => s"CAST(count($c) AS DOUBLE)"),
        row("mean", c => s"CAST(round(CAST(avg($c) AS DECIMAL(27,12)), 6) AS DOUBLE)"),
        row("std", c => s"round(stddev_samp($c), 6)"),
        row("min", c => s"CAST(min($c) AS DOUBLE)"),
        row("25%", c => s"round(quantile_cont($c, 0.25), 6)"),
        row("50%", c => s"round(quantile_cont($c, 0.5), 6)"),
        row("75%", c => s"round(quantile_cont($c, 0.75), 6)"),
        row("max", c => s"CAST(max($c) AS DOUBLE)"),
      ).mkString("\nUNION ALL\n")
    },

    "agg_describe_ts" ->
      """SELECT count(ts) AS n,
        |  make_timestamp((CAST(sum(floor(epoch(ts))) AS BIGINT)
        |    // count(ts)) * 1000000) AS mean_ts,
        |  CAST(min(ts) AS TIMESTAMP) AS min_ts,
        |  CAST(max(ts) AS TIMESTAMP) AS max_ts
        |FROM events""".stripMargin,

    "agg_mode" ->
      """WITH c1 AS (SELECT CAST(event_type AS VARCHAR) AS v, count(*) AS n
        |           FROM events GROUP BY 1),
        |r1 AS (SELECT v, row_number() OVER (ORDER BY v) AS rw
        |       FROM c1 WHERE n = (SELECT max(n) FROM c1)),
        |c2 AS (SELECT CAST(user_id AS VARCHAR) AS v, count(*) AS n
        |       FROM events GROUP BY 1),
        |r2 AS (SELECT v, row_number() OVER (ORDER BY v) AS rw
        |       FROM c2 WHERE n = (SELECT max(n) FROM c2))
        |SELECT coalesce(r1.rw, r2.rw) AS row_idx,
        |  r1.v AS event_type, r2.v AS user_id
        |FROM r1 FULL OUTER JOIN r2 ON r1.rw = r2.rw""".stripMargin,
  )
}
