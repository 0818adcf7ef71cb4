package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / analysis operators, all as codegen'd
  * column expressions (no UDFs): tokenization, word shingles, MinHash
  * signatures, SimHash, rolling-hash fingerprints.
  *
  * Everything is deterministic — hash seeds are literal ints — so results
  * are identical across runs, partitionings and cluster sizes.
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

  /** `k` MinHash values: minᵢ xxhash64(shingle, seed) per seed — the
    * classic permutation-free MinHash (Broder 1997). k×|shingles| hashes
    * per row, all inside codegen. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingles, s => xxhash64(s, seed))))

  /** Packs band `b` (of `rowsPerBand` signature slots) into one bucket key:
    * docs agreeing on a whole band collide → LSH candidates. Hashes the
    * slots directly (no polynomial accumulation — ANSI mode would overflow
    * long on 64-bit minhash values). */
  def minhashBandKey(sig: Column, band: Column, rowsPerBand: Int): Column =
    xxhash64(band +: (0 until rowsPerBand).map(j =>
      element_at(sig, (band * rowsPerBand + j + 1).cast("int"))): _*)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** 64-bit SimHash (Charikar 2002): per bit j, sum ±1 over tokens by bit j
    * of xxhash64(token), then take the sign. Near-identical docs differ in
    * a few bits (compare with hamming()). */
  def simhash64(toks: Column): Column = {
    val bitSums = transform(sequence(lit(0), lit(63)), j =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
      acc.bitwiseOR(when(element_at(bitSums, (j + 1).cast("int")) > 0L,
        call_function("shiftleft", lit(1L), j)).otherwise(0L)))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): rolling
    * hashes of `n`-word shingles, then the min hash of each sliding window
    * of `w` — a position-robust document signature. */
  def winnowFingerprints(toks: Column, n: Int, w: Int): Column = {
    val hashes = transform(wordShingles(toks, n), s => xxhash64(s))
    val mins = when(size(hashes) < w, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(0), size(hashes) - w),
        i => array_min(slice(hashes, i + 1, lit(w)))))
    array_sort(array_distinct(mins))
  }
}
