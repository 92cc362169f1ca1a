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
  )

  def oracle: Map[String, String] = Map(
    "agg_describe" -> {
      val cs = descCols
      def row(label: String, f: String => String) =
        s"SELECT '$label' AS stat, " +
          cs.map(c => s"${f(c)} AS $c").mkString(", ") + " FROM lineitem"
      Seq(
        row("count", c => s"CAST(count($c) AS DOUBLE)"),
        row("mean", c => s"round(avg($c), 6)"),
        row("std", c => s"round(stddev_samp($c), 6)"),
        row("min", c => s"CAST(min($c) AS DOUBLE)"),
        row("25%", c => s"round(quantile_cont($c, 0.25), 6)"),
        row("50%", c => s"round(quantile_cont($c, 0.5), 6)"),
        row("75%", c => s"round(quantile_cont($c, 0.75), 6)"),
        row("max", c => s"CAST(max($c) AS DOUBLE)"),
      ).mkString("\nUNION ALL\n")
    },

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
