package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregation of fixed-point decimal data (prices,
  * discounts, metric values stored as doubles).
  *
  * Floating sums are nondeterministic in the last ulp (partition/merge
  * order), so `round(sum(x), 2)` can flip at a half-cent boundary between
  * two runs — or between Spark and the DuckDB oracle (a q21 gate run
  * failed exactly this way). The fix: scale each VALUE to integer units
  * (exact per row on both engines — one multiply + one round of the same
  * IEEE double), sum the longs (associative, exact), and divide once at
  * the end (fixed operands → identical IEEE result everywhere).
  *
  * The SQL builders emit the equivalent DuckDB text, with the same
  * operation ORDER, so the driver's hash compare is bit-stable.
  */
object Money {

  /** exact 2-dp sum; `scale` = units per 1.0 (100 ⇒ cents; use 10000 for
    * per-row products like price×(1−discount) that carry 4 decimals). */
  def sum2(c: Column, scale: Long = 100L): Column =
    round(sum(round(c * scale).cast("long")) / scale.toDouble, 2)

  def sqlSum2(e: String, scale: Long = 100L): String =
    s"round(CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT) / $scale.0, 2)"

  /** exact 4-dp average (sum in integer units, divide by count last). */
  def avg4(c: Column, scale: Long = 10000L): Column =
    round(sum(round(c * scale).cast("long")) / count(lit(1)) / scale.toDouble, 4)

  def sqlAvg4(e: String, scale: Long = 10000L): String =
    s"round(CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT) / count(*) / $scale.0, 4)"
}
