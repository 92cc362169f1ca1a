package graft.sink

import org.apache.spark.sql.DataFrame

/** Logical sink operations, independent of any physical sink.
  *
  * The reference's upsert is performed by PostgreSQL inside CKAN
  * (`datapump.py:560-566`, `method='upsert'`): insert-or-update by primary
  * key, incoming batch wins. Expressed relationally (SURVEY §2.1):
  * result = new ∪ (old ⟕anti new on pk) — which is what lets the driver
  * oracle-check it without a database, and what `foreachBatch` feeds the
  * physical JDBC sink per micro-batch.
  */
object SinkOps {

  /** PK upsert: every row of `incoming` plus the rows of `existing` whose
    * PK does not appear in `incoming`. One shuffle on the PK (the anti
    * join); at scale both sides hash-partition on the PK so the union is
    * shuffle-free afterwards. */
  def logicalUpsert(existing: DataFrame, incoming: DataFrame,
      pk: Seq[String]): DataFrame = {
    val incomingKeys = incoming.select(pk.head, pk.tail: _*)
    incoming.unionByName(
      existing.join(incomingKeys, pk, "left_anti"))
  }

  /** CDC changelog apply: collapse an insert/update/delete change stream
    * onto a snapshot. `changes` carries the snapshot's value columns plus
    * `opCol` (`"I" | "U" | "D"` — I and U are both "upsert latest image";
    * the distinction matters to log producers, not to state) and
    * `orderCols` (e.g. commit ts + intra-commit seq) defining per-key
    * change order. For each key the LATEST change wins: an upsert
    * replaces the snapshot row (or inserts), a delete removes it — so a
    * key deleted then re-inserted survives with the re-inserted image,
    * and a key updated then deleted is gone.
    *
    * Shape: one window shuffle keyed on the PK over the change log
    * (latest-change pick = win_dedupe_rank's exchange class), then one
    * anti-join of the snapshot against the touched-key set. The change
    * log is normally ≪ the snapshot, so the anti-join broadcasts and the
    * snapshot is NEVER shuffled — the 100 TB cost is a scan, not an
    * exchange. Delete rows may carry null value columns; they only
    * contribute their key. */
  def cdcApply(snapshot: DataFrame, changes: DataFrame, pk: Seq[String],
      orderCols: Seq[String], opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D").drop(opCol)
    snapshot.join(latest.select(pk.head, pk.tail: _*), pk, "left_anti")
      .unionByName(survivors.select(snapshot.columns.map(col): _*))
  }

  /** Slowly-Changing-Dimension TYPE 2 merge: apply `updates` (one row per
    * key, new attribute values, effective at `effectiveTs`) to the
    * version table `dim` (schema = key ++ tracked ++ valid_from TIMESTAMP
    * ++ valid_to TIMESTAMP-nullable ++ is_current BOOLEAN), keeping full
    * history:
    *   - a CHANGED key's current version closes (valid_to = effectiveTs,
    *     is_current = false) and a new open version is born;
    *   - an update that equals the current version's tracked values is a
    *     NO-OP (change detection — reloading a dimension snapshot daily
    *     must not mint spurious versions);
    *   - an update for an UNSEEN key inserts its first open version;
    *   - an update for a key whose versions are ALL closed (an
    *     externally end-dated key with no is_current row) re-opens it:
    *     a new open version is born, history untouched;
    *   - closed (historical) versions pass through untouched.
    * Null-safe equality (`<=>`) on tracked columns: null → value is a
    * change, null → null is not.
    *
    * Shape: one hash exchange CLASS on the key — the dim left-joins the
    * (already small, one-row-per-key) update batch for pass-through and
    * closing, and the updates left-join the dim's CURRENT versions (≤1
    * row per key) for births; both joins share the key partitioning, and
    * births compare against the current row, not against `valid_from`
    * nullness, which is what makes the all-closed-key case a birth
    * instead of silent update loss. No window: the "current version" is
    * found by the is_current flag, not by ordering, so the cost at 100 TB
    * is one shuffle class of the dim — and none of it if both sides are
    * pre-bucketed on the key. */
  def scd2Merge(dim: DataFrame, updates: DataFrame, keyCols: Seq[String],
      trackedCols: Seq[String],
      effectiveTs: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    // presence marker (not isNotNull on tracked cols — updates may
    // legitimately carry nulls)
    val u = trackedCols.foldLeft(updates) { (acc, c) =>
      acc.withColumnRenamed(c, s"__u_$c")
    }.withColumn("__u_present", lit(true))
    val joined = dim.join(u, keyCols, "left")
    val changed = trackedCols
      .map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val hasUpdate = col("__u_present").isNotNull
    // existing versions: closed ones and unchanged/un-updated current
    // ones pass through; a current version hit by a real change closes
    val fromDim = joined
      .select(
        (keyCols.map(col) ++ trackedCols.map(col) :+
          col("valid_from") :+
          when(col("is_current") && hasUpdate && changed, effectiveTs)
            .otherwise(col("valid_to")).as("valid_to") :+
          when(col("is_current") && hasUpdate && changed, lit(false))
            .otherwise(col("is_current")).as("is_current")): _*)
    // new versions: one per update whose key has no CURRENT version
    // (never seen, or all versions closed) or whose current version
    // changed — anti-ish left join against the ≤1-per-key current slice
    val cur = dim.filter(col("is_current"))
      .select((keyCols.map(col) ++
        trackedCols.map(c => col(c).as(s"__d_$c")) :+
        lit(true).as("__d_present")): _*)
    val changedVsCur = trackedCols
      .map(c => !(col(s"__u_$c") <=> col(s"__d_$c"))).reduce(_ || _)
    val born = u.join(cur, keyCols, "left")
      .filter(col("__d_present").isNull || changedVsCur)
      .select(
        (keyCols.map(col) ++
          trackedCols.map(c => col(s"__u_$c").as(c)) :+
          effectiveTs.as("valid_from") :+
          lit(null).cast("timestamp").as("valid_to") :+
          lit(true).as("is_current")): _*)
    fromDim.unionByName(born)
  }
}
