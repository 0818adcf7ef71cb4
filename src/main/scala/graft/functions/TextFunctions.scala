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
  * core — minutes per partition at sf0.1. Signature computations here are
  * instead structured as explode → hash-aggregate: the per-element work is
  * plain row expressions inside whole-stage codegen, and the k accumulators
  * are ordinary min/sum aggregates with map-side partial aggregation. That
  * shape is also the right 100 TB plan: one narrow explode, one shuffle on
  * the doc key.
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

  /** `k` MinHash values per document (Broder 1997, permutation-free): from
    * a (id, shingles array) frame, explode shingles and run k `min` hash
    * aggregates — returns (idCol, sig array<long>[k]). Codegen'd end to
    * end; the only shuffle is the partial-agg'd groupBy on the id. */
  /** Variant over pre-hashed shingle-id sets (see shingleIdSet): the k
    * hash functions derive from the 64-bit id and one re-hash of it as
    * h1 xor rotl(h2, j) — no string ever enters the explode/shuffle, and
    * the same ids column feeds both signature and exact-Jaccard verify,
    * so the corpus is tokenized once. */
  def minhashSignaturesFromIds(df: DataFrame, idCol: String, idsCol: String, k: Int): DataFrame = {
    val ex = df.select(col(idCol), explode(col(idsCol)).as("__h1"))
      .select(col(idCol), col("__h1"), xxhash64(col("__h1"), lit(7777)).as("__h2"))
    def rotl(c: Column, j: Int): Column =
      if (j % 64 == 0) c
      else shiftleft(c, j % 64).bitwiseOR(shiftrightunsigned(c, 64 - (j % 64)))
    val aggs = (0 until k).map(j => min(col("__h1").bitwiseXOR(rotl(col("__h2"), j))).as(s"__m$j"))
    ex.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"__m$j")): _*).as("sig"))
  }

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

  /** Shingle set → sorted distinct xxhash64 ids: the representation
    * jaccardHashed verifies in a codegen'd merge walk. Hashing runs once
    * per document; candidate pairs then never touch strings. */
  def shingleIdSet(shingles: Column): Column =
    array_sort(array_distinct(transform(shingles, s => xxhash64(s))))

  /** Jaccard over shingleIdSet columns — |A∩B| via the native
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

  /** 64-bit SimHash per document (Charikar 2002): per bit j, sum ±1 over
    * token instances by bit j of xxhash64(token), then take the sign.
    * Same explode → 64 sum-aggregates shape as minhashSignatures; the
    * token hash is computed ONCE per token, bits are extracted from it.
    * Returns (idCol, sim: long). */
  def simhashSignatures(df: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val ex = df.select(col(idCol), explode(col(toksCol)).as("__t"))
      .select(col(idCol), xxhash64(col("__t")).as("__h"))
    val aggs = (0 until 64).map(j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"__b$j"))
    ex.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
          acc.bitwiseOR(when(col(s"__b$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
        }.as("sim"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): rolling
    * hashes of `n`-word shingles, min hash per sliding window of `w`,
    * distinct mins = the document signature. Shaped as posexplode → sliding
    * window-min (WindowExec partitioned by doc, ~|shingles| rows each) →
    * per-doc aggregate, instead of a nested-lambda slice scan that would
    * re-hash the document once per window position.
    * Returns (idCol, n_fp, fp_min, fp_sig). */
  def winnowFingerprintsDf(df: DataFrame, idCol: String, toksCol: String, n: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol),
      posexplode(wordShingles(col(toksCol), n)).as(Seq("__pos", "__s")))
      .select(col(idCol), col("__pos"), xxhash64(col("__s")).as("__h"))
    val byDoc = Window.partitionBy(idCol).orderBy("__pos").rowsBetween(-(w - 1), 0)
    val cnt = Window.partitionBy(idCol)
    val mins = sh
      .withColumn("__mh", min(col("__h")).over(byDoc))
      .withColumn("__n", count(lit(1)).over(cnt))
      // keep only full windows; short docs (< w shingles) keep their last
      // row, whose window covers every shingle — one whole-doc fingerprint
      .filter(col("__pos") >= w - 1 || (col("__n") < w && col("__pos") === col("__n") - 1))
    mins.groupBy(col(idCol), col("__mh")).agg(count(lit(1)).as("__dup"))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_fp"),
        min(col("__mh")).as("fp_min"),
        expr("bit_xor(__mh)").as("fp_sig"))
  }
}
