package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round
import org.apache.spark.sql.types.DecimalType

/** Boundary-stable rounding for double values compared across engines.
  *
  * `round(double, n)` diverges between Spark and DuckDB when the value
  * sits at a decimal n+1 `…5` boundary: Spark rounds the double's
  * shortest-decimal representation (HALF_UP on the printed digits), DuckDB
  * rounds the binary value. This is NOT a rare event for this corpus — a
  * bucket mean whose exact rational value terminates at the boundary digit
  * (sum of 2-decimal values over a power-of-two count, e.g.
  * 5564.52 / 128 = 43.4728125) hits it deterministically; observed at
  * sf0.1 on `agg_resample_mean`. The same class covers any ratio of small
  * integers (jaccard, token ratios) and raw float columns (≈7 significant
  * decimals).
  *
  * Fix: bridge through DECIMAL(27,12). Casting the double to scale 12
  * reconstructs the intended decimal value — stable to summation-order
  * noise (≤ ~1e-13, well under the 5e-13 half-step) — and rounding a
  * DECIMAL is exact and identical in both engines. Oracle SQL mirrors it
  * via [[StableRound.sqlN]].
  */
object StableRound {

  def roundN(c: Column, n: Int): Column =
    round(c.cast(DecimalType(27, 12)), n).cast("double")

  def round6(c: Column): Column = roundN(c, 6)
  def round4(c: Column): Column = roundN(c, 4)

  /** DuckDB-side twin of [[roundN]] for oracle SQL. */
  def sqlN(expr: String, n: Int): String =
    s"CAST(round(CAST($expr AS DECIMAL(27,12)), $n) AS DOUBLE)"
  def sql6(expr: String): String = sqlN(expr, 6)
  def sql4(expr: String): String = sqlN(expr, 4)
}
