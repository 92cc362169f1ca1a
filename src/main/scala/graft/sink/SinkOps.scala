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
}
