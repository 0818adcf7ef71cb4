package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / analysis operators: tokenization, word
  * shingles, MinHash signatures, SimHash, rolling-hash fingerprints.
  *
  * Everything is deterministic — hash seeds are literal ints — so results
  * are identical across runs, partitionings and cluster sizes.
  *
  * PERFORMANCE RULE learned the hard way (r02 bench): Spark's higher-order
  * functions (transform/aggregate/filter) evaluate INTERPRETED, and an
  * expression referenced inside a lambda is re-evaluated on every lambda
  * invocation after projection collapse. A "transform(seq(0,63), j ->
  * ...over tokens...)" therefore re-splits the document 64 times on one
  * core — minutes per partition at sf0.1. Whole-signature computations
  * (shingle ids, MinHash bands, SimHash) are native single-pass
  * expressions in graft.expressions — map-only, no explode, no shuffle
  * (see SignatureExpressions.scala scaladoc for the plan rationale).
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** `n`-word shingles; a document shorter than `n` words contributes its
    * whole token string as one shingle (so it still gets a signature). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** n-word shingle ids (sorted distinct xxhash64 longs) straight from the
    * raw `split` output — one native single-pass expression, map-only (the
    * r02 explode → k-aggregate shape paid a shuffle per signature). Empty
    * tokens are skipped inside the expression, so callers pass
    * `split(text, "\\s+")` without a filter HOF. */
  def shingleIds(rawTokens: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.ShingleIds(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens), n))

  /** [[shingleIds]] on the CROSS-ENGINE polynomial hash (r16) — same
    * sorted-distinct set semantics, ids an external SQL oracle can
    * regenerate (code-point polynomial mod 1e9+7, the WinnowFingerprint
    * formula). For entries that carry a hard DuckDB oracle. */
  def polyShingleIds(rawTokens: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.ShingleIds(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens), n,
        polynomial = true))

  /** Space-joined n-gram STRINGS from raw `split` output — for
    * operators whose grams must be reproducible by an external SQL
    * engine (oracle parity); empty array when the doc has fewer than n
    * tokens. One native pass, same skip-empty-token rule as the id
    * variants. */
  def ngramStrings(rawTokens: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.NGramStrings(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens), n))

  /** Order-preserving non-distinct n-gram ids from raw `split` output —
    * the LM-statistics companion to shingleIds (empty array when the doc
    * has fewer than n tokens). */
  def ngramIds(rawTokens: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.NGramIds(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens), n))

  /** `bands` LSH bucket keys from the k MinHash slots of a shingle-id set
    * (Broder 1997, permutation-free) — one pass, map-only; documents
    * agreeing on a whole band collide. */
  def minhashBandKeys(ids: Column, k: Int, bands: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.MinHashBandKeys(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(ids), k, bands))

  /** [[minhashBandKeys]] with CROSS-ENGINE affine permutations (r16):
    * (a_j·x + b_j) mod 2^31−1 slots + polynomial band folds, every step
    * int64-safe for the SQL oracle. Pair with [[polyShingleIds]]. */
  def affineMinhashBandKeys(ids: Column, k: Int, bands: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.MinHashBandKeys(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(ids), k, bands,
        affine = true))

  /** 64-bit SimHash (Charikar 2002) from raw `split` output — one pass,
    * map-only. */
  def simhashSig(rawTokens: Column): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.SimHashSig(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens)))

  /** [[simhashSig]] on the CROSS-ENGINE polynomial token hash (r16):
    * 62 usable bits from two code-point polynomials — the SQL oracle
    * regenerates the signature bit-for-bit. */
  def polySimhashSig(rawTokens: Column): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.SimHashSig(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens),
        polynomial = true))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** Jaccard over shingleIds columns — |A∩B| via the native
    * SortedIntersectCount expression, |A∪B| = |A|+|B|-|A∩B|. Equal to
    * string-set Jaccard up to 64-bit hash collisions (negligible). */
  def jaccardHashed(a: Column, b: Column): Column = {
    val inter = org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(a),
        org.apache.spark.sql.graftshim.ColumnExpr.expression(b))).cast("double")
    val uni = size(a).cast("double") + size(b).cast("double") - inter
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) as one native
    * pass over the raw `split` output — struct(n_fp, fp_min, fp_sig),
    * map-only (the r02 posexplode → WindowExec → groupBy shape paid two
    * shuffles and a per-doc sort). */
  def winnowFingerprint(rawTokens: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rawTokens), n, w))
}
