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

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** cos(a,b) with zero-vector guard. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** `nBits` random-hyperplane signs of `vec` as an int array (SimHash for
    * real-valued vectors, Charikar 2002). Hyperplane p's component for
    * dimension i is a deterministic pseudo-random in [-1,1] derived from
    * xxhash64(p,i) — reproducible across executors with no broadcast of
    * plane matrices, and cheap enough (nBits×dim mults) to stay columnar. */
  def hyperplaneBits(vec: Column, nBits: Int): Column = {
    val v = vec.cast("array<double>")
    transform(sequence(lit(0), lit(nBits - 1)), p => {
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x * (pmod(xxhash64(p, i), lit(1000003L)).cast("double") / 500001.5 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0.0, 1).otherwise(0)
    })
  }

  /** Packs `rowsPerBand` consecutive sign bits of band `b` into one long
    * bucket key (LSH banding: near vectors collide in ≥1 band). */
  def bandKey(bits: Column, band: Column, rowsPerBand: Int): Column =
    aggregate(sequence(lit(0), lit(rowsPerBand - 1)), lit(0L),
      (acc, j) => acc * 2 + element_at(bits, (band * rowsPerBand + j + 1).cast("int")).cast("long"))
}
