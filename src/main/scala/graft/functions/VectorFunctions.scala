package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float/double>` columns, built entirely from
  * Spark's codegen'd higher-order functions (`transform`/`aggregate`/
  * `zip_with`) — no UDFs, so every expression stays inside whole-stage
  * codegen and runs at full columnar speed on a 1000-executor cluster.
  *
  * The reference has no vector ops (its surface is relational); these back
  * the brief's training-data-pipeline operators (ANN, embedding dedup).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — graft's native codegen expression (a zip_with/aggregate
    * formulation runs interpreted: ~200 boxed evals per 64-dim pair, which
    * dominated LSH candidate verification in the r02 bench). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(a.cast("array<double>")),
        org.apache.spark.sql.graftshim.ColumnExpr.expression(b.cast("array<double>"))))

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) with zero-vector guard. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** a/‖a‖ (zero vectors pass through) — native one-pass expression.
    * Pre-normalizing each side ONCE turns pairwise cosine into a single
    * graft_dot per candidate — at k candidates per row that saves 2k norm
    * evaluations. */
  def normalized(a: Column): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.NormalizeVector(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(a.cast("array<double>"))))

  /** `bands` hyperplane-LSH bucket keys of `bitsPerBand` sign bits each
    * (Charikar 2002) — one native pass per vector, map-only (the r02
    * posexplode → nBits-aggregate shape paid a full shuffle). Plane
    * components are a deterministic splitmix64 stream regenerated per
    * executor — nothing to broadcast, identical on every node. */
  def hyperplaneBandKeys(v: Column, bands: Int, bitsPerBand: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.HyperplaneBandKeys(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(v.cast("array<double>")),
        bands, bitsPerBand))

  /** [[hyperplaneBandKeys]] with CROSS-ENGINE LCG planes (r16) — same
    * sign-hash banding, but plane components come from int64-safe
    * modular arithmetic an external SQL engine replays exactly (DuckDB
    * BIGINT errors on overflow, so splitmix64's wrapping multiplies are
    * inexpressible there) — what lets ann_lsh carry a hard DuckDB
    * oracle. `maxDim` must match the oracle's plane width (the flat
    * plane index is p·maxDim+i on both sides). */
  def lcgHyperplaneBandKeys(v: Column, bands: Int, bitsPerBand: Int,
      maxDim: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.HyperplaneBandKeys(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(v.cast("array<double>")),
        bands, bitsPerBand, maxDim, lcgPlanes = true))
}
