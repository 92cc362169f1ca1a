package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key dedupe preserving arrival order — the reference's signature
  * operator (reference `datapump.py:446-456`:
  * `drop_duplicates(subset=pk, keep='first'|'last')`).
  *
  * Spark's `dropDuplicates` keeps an *arbitrary* row per key, which is wrong
  * under the reference's order-sensitive semantics. We instead rank rows by
  * an explicit arrival-order column within each PK group and keep rank 1.
  *
  * Scale notes: this is a single hash shuffle on the PK (window partitionBy),
  * with a per-key sort — no global sort. Per-key data volume bounds the sort;
  * a pathologically hot PK would need salting + a two-phase argmin, but PK
  * dedupe by construction has small groups (duplicates of one key).
  */
object Dedupe {

  /** Keep the first-arriving row per PK (reference `Dedupe: "first"`). */
  def keepFirst(df: DataFrame, pk: Seq[String], order: Column): DataFrame =
    keep(df, pk, order.asc)

  /** Keep the last-arriving row per PK (reference `Dedupe: "last"`). */
  def keepLast(df: DataFrame, pk: Seq[String], order: Column): DataFrame =
    keep(df, pk, order.desc)

  private def keep(df: DataFrame, pk: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord)
    df.withColumn("__arrival_rank", row_number().over(w))
      .filter(col("__arrival_rank") === 1)
      .drop("__arrival_rank")
  }

  /** Stamp a deterministic arrival-order column on a freshly-read file.
    * For a single-file read the partition index + intra-partition position
    * is monotone in file order, which is what the reference's pandas row
    * order means (`datapump.py:442` read_csv preserves file order).
    */
  def withArrivalOrder(df: DataFrame, colName: String = "__arrival"): DataFrame =
    df.withColumn(colName, monotonically_increasing_id())

  /** Count of PK-duplicate rows: total − distinct PKs
    * (reference `datapump.py:450` `df.duplicated(subset=pk).sum()`). */
  def dupeCountDf(df: DataFrame, pk: Seq[String]): DataFrame =
    df.agg((count(lit(1)) - count_distinct(struct(pk.map(col): _*)))
      .as("dupe_count"))
}
