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
    * `last/first(ignoreNulls)` over (key, ts, side) orderings — no
    * |L_k|×|R_k| pair blow-up when a key has many rows on both sides,
    * which is what kills the naive equi-join-then-rank plan at 100 TB
    * (`nearest` sorts the same partitioning twice, once per direction —
    * still no pair materialization).
    *
    * SKEW: the carry window partitions by (key, time CHUNK), not by key
    * alone, so a hot key (one sensor with years of readings) spreads
    * across `history-span / chunkMicros` tasks instead of serializing
    * into one. Cross-chunk matches are restored by a boundary carry:
    * per (key, chunk) the best boundary candidate (latest right row for
    * backward, earliest for forward) is aggregated into a tiny table —
    * one row per key-chunk, never row-sized — the carry-in for each
    * chunk is a window over THAT table ordered by chunk, and the result
    * joins back on (key, chunk). A right row in an earlier chunk is
    * strictly earlier in time than every row of later chunks, so the
    * within-instant side/tie ordering (exact-match semantics) only ever
    * resolves inside a single chunk and is unaffected by chunking.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: String,
      rightValueCols: Seq[String],
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      toleranceMicros: Option[Long] = None,
      chunkMicros: Long = 86400000000L): DataFrame = {
    require(chunkMicros > 0, "chunkMicros must be positive")
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
    // chunk = monotone function of ts (floor-div by a positive constant),
    // so chunk boundaries never split an instant: equal timestamps share
    // a chunk and the exact-match side ordering stays intra-chunk.
    val u = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__chunk",
        F.floor(F.unix_micros(col("__ts")) / F.lit(chunkMicros)))
    val valCols = rightValueCols.map(c => s"asof_$c")
    // ONE struct per right row (null for left rows), so the carried pick
    // is row-ATOMIC: a null right value column stays null in the output
    // instead of back-filling from a different right row — and each
    // direction costs one window aggregate instead of |valueCols|+1.
    val carryStruct = F.when(col("__side") === 0,
      F.struct((col("__rts_v") +: valCols.map(col)): _*))

    // Per-(key, chunk) boundary candidates: the right row a LATER chunk
    // would pick looking backward is this chunk's max-(ts, tie) right
    // row; an EARLIER chunk looking forward wants min-ts (max tie among
    // its instant), i.e. max of (-ts, tie). Left rows get a null
    // ordering struct, which max_by ignores. This table is one row per
    // key-chunk — the "tiny boundary shuffle".
    val ordB = F.when(col("__side") === 0,
      F.struct(F.unix_micros(col("__ts")), col("__tie")))
    val ordF = F.when(col("__side") === 0,
      F.struct(-F.unix_micros(col("__ts")), col("__tie")))
    val needB = direction != "forward"
    val needF = direction != "backward"
    val bounds = u.groupBy(col(leftKey), col("__chunk")).agg(
      F.max_by(carryStruct, ordB).as("__cb"),
      F.max_by(carryStruct, ordF).as("__cf"))
    val wPrev = Window.partitionBy(col(leftKey)).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(leftKey)).orderBy(col("__chunk").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val carries = bounds
      .withColumn("__prevc",
        if (needB) F.last(col("__cb"), ignoreNulls = true).over(wPrev)
        else F.lit(null))
      .withColumn("__nextc",
        if (needF) F.first(col("__cf"), ignoreNulls = true).over(wNext)
        else F.lit(null))
      .select(col(leftKey).as("__ck"), col("__chunk").as("__cc"),
        col("__prevc"), col("__nextc"))
    // Null-safe join keys: null-ts rows land in a null chunk group and
    // null keys form their own group, exactly as the un-chunked window
    // partitioning treated them.
    val uj = u.join(carries,
      col(leftKey) <=> col("__ck") && col("__chunk") <=> col("__cc"), "left")

    // backward: right rows sort BEFORE left at the same instant
    // (side 0 < 1), so "rightTs <= leftTs" is inclusive; among right
    // ties, tie asc makes last() pick the max tie-break. With
    // allowExactMatches=false (pandas semantics) the side sort FLIPS, so
    // same-instant right rows land after the left row — outside its
    // preceding frame — and the match becomes strictly-before.
    val wB = Window.partitionBy(col(leftKey), col("__chunk"))
      .orderBy(col("__ts").asc,
        if (allowExactMatches) col("__side").asc else col("__side").desc,
        col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left rows sort BEFORE right at the same instant
    // (side desc: 1 < 0 reversed), so "rightTs >= leftTs" is inclusive;
    // tie desc makes first() pick the max tie-break at the nearest
    // instant. Exact-match exclusion flips the side sort symmetrically.
    val wF = Window.partitionBy(col(leftKey), col("__chunk"))
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

    // In-chunk pick wins when present (it is nearer than any carry-in);
    // an empty in-chunk frame falls back to the cross-chunk boundary
    // carry, restoring the exact un-chunked semantics.
    val withPick = direction match {
      case "backward" =>
        uj.withColumn("__p0", F.coalesce(
            F.last(carryStruct, ignoreNulls = true).over(wB), col("__prevc")))
          .withColumn("__pick", gate(col("__p0"), bDist(col("__p0"))))
          .drop("__p0")
      case "forward" =>
        uj.withColumn("__p0", F.coalesce(
            F.first(carryStruct, ignoreNulls = true).over(wF), col("__nextc")))
          .withColumn("__pick", gate(col("__p0"), fDist(col("__p0"))))
          .drop("__p0")
      case "nearest" =>
        val both = uj
          .withColumn("__b0", F.coalesce(
            F.last(carryStruct, ignoreNulls = true).over(wB), col("__prevc")))
          .withColumn("__f0", F.coalesce(
            F.first(carryStruct, ignoreNulls = true).over(wF), col("__nextc")))
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
      .drop("__ts", "__side", "__tie", "__rts_v", "__pick",
        "__chunk", "__ck", "__cc", "__prevc", "__nextc")
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
