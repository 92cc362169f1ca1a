package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (SURVEY §2.3).
  *
  * The reference implements no joins (its only multi-table interaction is
  * the PK upsert performed by PostgreSQL, `datapump.py:560-566`); these are
  * the declared north-star relational operators.
  */
object Joins {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs <= leftTs` among rows sharing the join key; ties on ts broken
    * by the greatest `rightTieBreak`. Right value columns come back prefixed
    * `asof_`; left rows with no prior right row get nulls.
    *
    * Implementation is the scalable union trick, not join-then-prune:
    * tag both sides, union, and carry right values forward with
    * `last(ignoreNulls)` over (key, ts, side) ordering. This is ONE hash
    * shuffle on the key with linear per-key state — no |L_k|×|R_k| pair
    * blow-up when a key has many rows on both sides, which is what kills
    * the naive equi-join-then-rank plan at 100 TB.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: String,
      rightValueCols: Seq[String]): DataFrame = {
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r2 = right.select(
      (col(rightKey).as(leftKey) +:
        col(rightTs).cast("timestamp").as("__ts") +:
        col(rightTieBreak).as("__tie") +:
        rightValueCols.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("__side", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // Right rows sort before left rows at the same instant (side 0 < 1), so
    // "rightTs <= leftTs" is inclusive; among right ties, tie asc makes
    // last() pick the max tie-break.
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", F.last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__ts", "__side", "__tie")
  }
}
