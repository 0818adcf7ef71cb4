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

  /** a/‖a‖ (zero vectors pass through). Pre-normalizing each side ONCE
    * turns pairwise cosine into a single graft_dot per candidate — at k
    * candidates per row that saves 2k norm evaluations. The norm ref
    * inside the lambda re-evaluates per element (HOF rule), but that is
    * dim×dim mults once per VECTOR, amortized across all its pairs. */
  def normalized(a: Column): Column = {
    val v = a.cast("array<double>")
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** `nBits` random-hyperplane sign bits per vector (LSH for cosine,
    * Charikar 2002). Hyperplane p's component for dimension i is a
    * deterministic pseudo-random in [-1,1] from xxhash64(p,i) —
    * reproducible everywhere, no plane matrix to broadcast. Shaped as
    * posexplode(vec) → nBits sum-aggregates (codegen'd, partial-agg'd)
    * rather than nested lambdas, which would run interpreted and
    * re-evaluate per plane. Returns (idCol, bits array<int>[nBits]). */
  def hyperplaneSignatures(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String, nBits: Int): org.apache.spark.sql.DataFrame = {
    val ex = df.select(col(idCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
    val aggs = (0 until nBits).map(p =>
      sum(col("__x") * (pmod(xxhash64(lit(p), col("__i")), lit(1000003L)).cast("double") / 500001.5 - 1.0))
        .as(s"__d$p"))
    ex.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until nBits).map(p =>
        when(col(s"__d$p") > 0.0, 1).otherwise(0)): _*).as("bits"))
  }

  /** Packs `rowsPerBand` consecutive sign bits of band `b` into one long
    * bucket key (LSH banding: near vectors collide in ≥1 band). */
  def bandKey(bits: Column, band: Column, rowsPerBand: Int): Column =
    aggregate(sequence(lit(0), lit(rowsPerBand - 1)), lit(0L),
      (acc, j) => acc * 2 + element_at(bits, (band * rowsPerBand + j + 1).cast("int")).cast("long"))
}
