package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys are SURVEY §2 op ids; `oracleSql` carries DuckDB SQL for
  * every SQL-expressible op (same column names as the Spark result — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries,
    RelationalQueries,
    ScalarQueries,
    StatsQueries,
    TextQueries,
    CorpusQueries,
    VectorQueries,
    IngestQueries,
    StreamQueries,
    MultimodalQueries,
    GraphQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's soul in one pipeline (datapump.py:442→:453→:294):
    * scan → order-sensitive PK dedupe (keep last) → hourly resample mean.
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val deduped = ops.Dedupe.keepLast(
      events, Seq("user_id", "event_type"), col("event_id"))
    ops.TimeSeries.resampleMean(
      deduped, "ts", "H", Seq("event_type"), Seq("value"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap

  require(oracleSql.keySet.subsetOf(queries.keySet),
    s"oracle keys without queries: ${oracleSql.keySet -- queries.keySet}")
}
