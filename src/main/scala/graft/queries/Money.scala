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
  * NO final decimal re-round (r12): `round(double, 2)` is the one step
  * whose result is ENGINE-dependent — Spark rounds the exact binary
  * expansion via BigDecimal HALF_UP, DuckDB scales-and-nearbyints the
  * double — and on data whose unit sum lands on a half-cent
  * representation the two legitimately diverge (the r11 driver red on
  * lake_migrate). IEEE-754 fully specifies long→double conversion
  * (exact below 2^53) and double division (correctly rounded), so
  * `sum_units / scale` with fixed operands is bit-identical on every
  * engine; a trailing 2-dp re-round of that value adds zero information
  * and one cross-engine tie hazard. Entries that must be defensible on
  * ANY dataset (driver hash compare) keep the quotient unrounded; truly
  * exact money totals use [[sumUnits]] (integer units end-to-end).
  *
  * The SQL builders emit the equivalent DuckDB text, with the same
  * operation ORDER, so the driver's hash compare is bit-stable.
  */
object Money {

  /** exact unit sum divided once (UNROUNDED quotient — see the r12 note
    * above; do NOT re-round either side); `scale` = units per 1.0 (100 ⇒
    * cents; 10000 for per-row products like price×(1−discount) that
    * carry 4 decimals). */
  def sum2(c: Column, scale: Long = 100L): Column =
    sum(round(c * scale).cast("long")) / scale.toDouble

  def sqlSum2(e: String, scale: Long = 100L): String =
    s"CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT) / $scale.0"

  /** Engine-DETERMINISTIC n-digit quantization of a per-row double:
    * `floor(x*s + 0.5) / s`. Multiply, add, floor, divide are each fully
    * IEEE-specified, so both engines compute the identical double when
    * the SQL side ([[sqlQround]]) mirrors the op order. Native `round()`
    * is the one op with engine freedom — Spark rounds the exact decimal
    * expansion HALF_UP, DuckDB scales in floating point and nearbyints —
    * and the two legitimately diverge near representation boundaries
    * (the r11 lake_migrate red). Convention: exact halves go toward
    * +inf. Spark's floor returns BIGINT (DuckDB's a DOUBLE); the final
    * division lands both on the same double. */
  def qround(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + 0.5) / s
  }

  def sqlQround(e: String, digits: Int): String = {
    val s = math.pow(10, digits).toLong
    s"floor(($e) * $s.0 + 0.5) / $s.0"
  }

  /** exact integer-unit sum (BIGINT both engines) — zero floating point
    * anywhere past the per-row scaling, bit-exact on any dataset. */
  def sumUnits(c: Column, scale: Long = 100L): Column =
    sum(round(c * scale).cast("long"))

  def sqlSumUnits(e: String, scale: Long = 100L): String =
    s"CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT)"

  /** unit-exact mean (sum in integer units, two fixed-order divisions,
    * UNROUNDED quotient — same cross-engine posture as [[sum2]]). */
  def avg4(c: Column, scale: Long = 10000L): Column =
    sum(round(c * scale).cast("long")) / count(lit(1)) / scale.toDouble

  def sqlAvg4(e: String, scale: Long = 10000L): String =
    s"CAST(sum(CAST(round(($e) * $scale) AS BIGINT)) AS BIGINT) / count(*) / $scale.0"
}
