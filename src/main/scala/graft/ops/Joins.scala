package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-ins (SURVEY §2.3).
  *
  * The reference implements no joins (its only multi-table interaction is
  * the PK upsert performed by PostgreSQL, `datapump.py:560-566`); these are
  * the declared north-star relational operators.
  */
object Joins {

  /** As-of join, pandas `merge_asof` directions:
    *  - `backward` (default): the right row with the greatest
    *    `rightTs <= leftTs` per key;
    *  - `forward`: the right row with the smallest `rightTs >= leftTs`;
    *  - `nearest`: whichever of the two is closest in absolute time
    *    (exact-distance ties prefer backward).
    * Exact-instant matches count in every direction by default (pandas
    * allow_exact_matches=True; pass `allowExactMatches = false` for the
    * strict variant). `toleranceMicros` mirrors pandas `tolerance`: a
    * match farther than the bound (per direction, before the nearest
    * choice) nulls out. Ties on the chosen instant break by the
    * greatest `rightTieBreak`. Right value columns come back prefixed
    * `asof_`; left rows with no candidate get nulls.
    *
    * Implementation is the scalable union trick, not join-then-prune:
    * tag both sides, union, and carry right values across with
    * `last/first(ignoreNulls)` over (key, ts, side) orderings. This is
    * ONE hash shuffle on the key with linear per-key state — no
    * |L_k|×|R_k| pair blow-up when a key has many rows on both sides,
    * which is what kills the naive equi-join-then-rank plan at 100 TB
    * (`nearest` sorts the same partitioning twice, once per direction —
    * still no pair materialization).
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: String,
      rightValueCols: Seq[String],
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    val l2 = left
      .withColumn("__ts", col(leftTs).cast("timestamp"))
      .withColumn("__side", lit(1))
    // __rts rides along as an extra carried column so `nearest` can
    // compare match distances
    val r2 = right.select(
      (col(rightKey).as(leftKey) +:
        col(rightTs).cast("timestamp").as("__ts") +:
        col(rightTieBreak).as("__tie") +:
        col(rightTs).cast("timestamp").as("__rts_v") +:
        rightValueCols.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("__side", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val valCols = rightValueCols.map(c => s"asof_$c")
    // ONE struct per right row (null for left rows), so the carried pick
    // is row-ATOMIC: a null right value column stays null in the output
    // instead of back-filling from a different right row — and each
    // direction costs one window aggregate instead of |valueCols|+1.
    val carryStruct = F.when(col("__side") === 0,
      F.struct((col("__rts_v") +: valCols.map(col)): _*))

    // backward: right rows sort BEFORE left at the same instant
    // (side 0 < 1), so "rightTs <= leftTs" is inclusive; among right
    // ties, tie asc makes last() pick the max tie-break. With
    // allowExactMatches=false (pandas semantics) the side sort FLIPS, so
    // same-instant right rows land after the left row — outside its
    // preceding frame — and the match becomes strictly-before.
    val wB = Window.partitionBy(col(leftKey))
      .orderBy(col("__ts").asc,
        if (allowExactMatches) col("__side").asc else col("__side").desc,
        col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left rows sort BEFORE right at the same instant
    // (side desc: 1 < 0 reversed), so "rightTs >= leftTs" is inclusive;
    // tie desc makes first() pick the max tie-break at the nearest
    // instant. Exact-match exclusion flips the side sort symmetrically.
    val wF = Window.partitionBy(col(leftKey))
      .orderBy(col("__ts").asc,
        if (allowExactMatches) col("__side").desc else col("__side").asc,
        col("__tie").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // pandas `tolerance`: a picked match is kept only when its event-time
    // distance is within the bound — applied per DIRECTION before the
    // nearest choice, so nearest picks the closest IN-TOLERANCE candidate
    def gate(pick: Column, dist: Column): Column = toleranceMicros match {
      case Some(t) => F.when(pick.isNotNull && dist <= F.lit(t), pick)
      case None => pick
    }
    def bDist(p: Column) = F.unix_micros(col("__ts")) -
      F.unix_micros(p.getField("__rts_v"))
    def fDist(p: Column) = F.unix_micros(p.getField("__rts_v")) -
      F.unix_micros(col("__ts"))

    val withPick = direction match {
      case "backward" =>
        u.withColumn("__p0", F.last(carryStruct, ignoreNulls = true).over(wB))
          .withColumn("__pick", gate(col("__p0"), bDist(col("__p0"))))
          .drop("__p0")
      case "forward" =>
        u.withColumn("__p0", F.first(carryStruct, ignoreNulls = true).over(wF))
          .withColumn("__pick", gate(col("__p0"), fDist(col("__p0"))))
          .drop("__p0")
      case "nearest" =>
        val both = u
          .withColumn("__b0", F.last(carryStruct, ignoreNulls = true).over(wB))
          .withColumn("__f0", F.first(carryStruct, ignoreNulls = true).over(wF))
          .withColumn("__b", gate(col("__b0"), bDist(col("__b0"))))
          .withColumn("__f", gate(col("__f0"), fDist(col("__f0"))))
          .drop("__b0", "__f0")
        // exact-microsecond distances (timestamps carry sub-second
        // precision; truncating to seconds would flip near-ties)
        val useB = col("__f").isNull ||
          (col("__b").isNotNull &&
            (F.unix_micros(col("__ts"))
              - F.unix_micros(col("__b").getField("__rts_v"))
              <= F.unix_micros(col("__f").getField("__rts_v"))
              - F.unix_micros(col("__ts"))))
        both.withColumn("__pick",
          F.when(useB, col("__b")).otherwise(col("__f")))
          .drop("__b", "__f")
    }
    val out = valCols.foldLeft(withPick) { (acc, c) =>
      acc.withColumn(c, col("__pick").getField(c))
    }
    out.filter(col("__side") === 1)
      .drop("__ts", "__side", "__tie", "__rts_v", "__pick")
  }

  /** Point-in-time (temporal) join: enrich each fact with the dimension
    * VERSION valid at the fact's timestamp — `ts ∈ [valid_from,
    * valid_to)`, half-open so a version boundary instant belongs to the
    * NEW version, `valid_to IS NULL` = still open (exactly the interval
    * contract [[graft.sink.SinkOps.scd2Merge]] maintains, so this is
    * the read side of the SCD2 tier). LEFT join: facts with no valid
    * version (unknown key, or ts before the first version) survive with
    * nulls.
    *
    * Shape: the EQUI key keeps this a hash/sort-merge join — the
    * interval predicates ride along as the join residual, evaluated per
    * key-matched pair, so cost is |facts| + Σ_k |facts_k|·|versions_k|
    * with the per-key version count bounded (dimension history), never
    * the |facts|×|dim| range-join blow-up. One exchange class on the
    * key; none if facts and dim are co-bucketed. */
  def temporalJoin(facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, tsCol: String,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(tsCol) >= dim(fromCol) &&
        (dim(toCol).isNull || facts(tsCol) < dim(toCol)),
      "left")
}
