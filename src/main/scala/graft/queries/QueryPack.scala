package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Contract (SURVEY §2 / SparkEntry): each key in `queries` is an op id from
  * the SURVEY §2 inventory; `oracle` holds DuckDB-runnable ANSI SQL over the
  * same parquet tables for every key whose semantics are SQL-expressible
  * (others get the driver's weaker rows-only check).
  *
  * Column names MUST match between the Spark result and the oracle SQL —
  * the driver sorts columns by name before hashing. Floating-point aggregate
  * outputs are rounded identically on both sides (summation order differs
  * between engines, so raw double aggregates can drift in the last ulps).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}

// Boundary-stable cross-engine rounding lives in graft.StableRound
// (package-level so ops/ can use it too); oracle SQL uses its sqlN twins.
