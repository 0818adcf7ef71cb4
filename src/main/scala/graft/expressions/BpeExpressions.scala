package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer primitives (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * The TRAINING side lives in [[Bpe.train]]: classic greedy merge learning
  * over a word-frequency table. The Spark job's corpus-scale work is only
  * the word COUNTING pass (one partial-agg'd groupBy — see
  * queries/BpeTokenizer.scala); training itself runs on the bounded
  * top-V word-frequency artifact, exactly like the PQ codebook
  * (Ann.Pq.train) — a model-fitting step, not a data pass.
  *
  * The ENCODE side is [[BpeEncodeStats]]: a native map-only expression
  * applying the learned merge ranks to every document. Merge tables are
  * model-sized constructor params (serialized with the task closure, the
  * same transport a broadcast would use at this size); per-task word→
  * encoding memoization exploits Zipf — encode cost is per DISTINCT word
  * per task, not per token.
  */
object Bpe {

  /** End-of-word marker, glued onto a word's final character so merges
    * crossing the word boundary cannot be learned (the paper's scheme:
    * `w o r d</w>`). */
  final val Eow = "</w>"

  /** A word as its initial symbol sequence: one symbol per character,
    * with the end-of-word marker appended to the final character. */
  def toSymbols(word: String): Array[String] = {
    val cps = word.toCharArray // synthetic corpus is ASCII; BMP-safe enough
    val out = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      out(i) = if (i == cps.length - 1) cps(i).toString + Eow else cps(i).toString
      i += 1
    }
    out
  }

  /** Greedy BPE merge learning over `(word, count)` rows. Deterministic:
    * the best pair maximizes summed count, ties broken by smallest
    * (left, right) lexicographically; learning stops early when the best
    * pair occurs fewer than `minCount` times (default 2 — a pair seen
    * once generalizes to nothing). O(V · avgLen · merges) driver work on
    * the bounded vocabulary artifact. */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (toSymbols(w), c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (pair, c) =>
          if (c > bestC || (c == bestC &&
              (pair._1 < best._1 || (pair._1 == best._1 && pair._2 < best._2))))
            { best = pair; bestC = c }
        }
        if (bestC < minCount) done = true
        else {
          merges += best
          vocab = vocab.map { case (syms, c) => (mergeOnce(syms, best._1, best._2), c) }
          k += 1
        }
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping pass replacing adjacent
    * (left, right) with left+right. */
  def mergeOnce(syms: Array[String], left: String, right: String): Array[String] = {
    val out = new java.util.ArrayList[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == left && syms(i + 1) == right) {
        out.add(left + right); i += 2
      } else { out.add(syms(i)); i += 1 }
    }
    out.toArray(new Array[String](out.size()))
  }

  /** Greedy encode of one word under learned merge ranks: repeatedly apply
    * the LOWEST-rank merge present (the standard BPE inference rule —
    * replays training order, so encoding a training word reproduces its
    * final training segmentation). `rev` is the rank→pair array (the
    * merge table in training order). */
  def encodeWord(word: String,
      ranks: java.util.HashMap[(String, String), Int],
      rev: Array[(String, String)]): Array[String] = {
    var syms = toSymbols(word)
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) go = false
      else {
        val pair = rev(bestRank)
        syms = mergeOnce(syms, pair._1, pair._2)
        go = syms.length > 1
      }
    }
    syms
  }

  /** Convenience for tests/driver code: encode under a merge list. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] =
    encodeWord(word, ranksOf(merges), merges.toArray)

  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }
}

/** `graft_repetition_stats(tokens)` → struct(n_words, n_distinct,
  * n_bigrams, n_distinct_bigrams, top_count): the count inputs of the
  * Gopher repetition signals (Rae et al. 2021 §A1.1) in ONE pass over
  * the token array. The HOF formulation (array_distinct + a
  * transform/filter quadratic top-word scan) evaluates interpreted and
  * was the heaviest per-row op in the sf1 scale run (6.5× at 10×);
  * this is a hash-set walk — O(tokens) per row, map-only. Empty tokens
  * skipped, same rule as the signature expressions; counts only — the
  * fraction arithmetic stays in (codegen'd) column space so the oracle
  * rounding semantics are untouched. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats needs array<string>, got $t")
  }
  override def dataType: DataType = new org.apache.spark.sql.types.StructType()
    .add("n_words", org.apache.spark.sql.types.IntegerType, nullable = false)
    .add("n_distinct", org.apache.spark.sql.types.IntegerType, nullable = false)
    .add("n_bigrams", org.apache.spark.sql.types.IntegerType, nullable = false)
    .add("n_distinct_bigrams", org.apache.spark.sql.types.IntegerType, nullable = false)
    .add("top_count", org.apache.spark.sql.types.IntegerType, nullable = false)
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new java.util.ArrayList[String](m)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) toks.add(t.toString)
      }
      i += 1
    }
    val n = toks.size()
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    i = 0
    while (i < n) {
      val prev = counts.get(toks.get(i))
      val c = if (prev == null) 1 else prev.intValue + 1
      counts.put(toks.get(i), Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    val nDistinct = counts.size()
    val bigrams = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n - 1) {
      bigrams.add(toks.get(i) + " " + toks.get(i + 1))
      i += 1
    }
    val nBigrams = math.max(0, n - 1)
    org.apache.spark.sql.catalyst.InternalRow(
      n, nDistinct, nBigrams, bigrams.size(), top)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bpe_stats(tokens)` → struct(n_bpe_tokens: long, head: string):
  * total BPE token count of a whitespace-tokenized document under the
  * learned `merges`, plus the space-joined encoding of its first word (a
  * human-auditable receipt column). Map-only; per-task memoization makes
  * the cost per distinct word, not per token (Zipf: a few thousand types
  * cover almost all tokens). Empty tokens skipped, same rule as the
  * signature expressions. */
case class BpeEncodeStats(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_stats needs array<string>, got $t")
  }
  override def dataType: DataType = new org.apache.spark.sql.types.StructType()
    .add("n_bpe_tokens", LongType, nullable = false)
    .add("head", StringType, nullable = false)
  override def prettyName: String = "graft_bpe_stats"

  @transient private lazy val ranks = Bpe.ranksOf(merges)
  @transient private lazy val rev = merges.toArray
  // per-task (deserialized-instance) word→(len, headEncoding) memo; capped
  // so an adversarial all-unique corpus can't grow it unboundedly
  @transient private lazy val memo = new java.util.HashMap[String, (Int, String)]()
  private val MemoCap = 1 << 16

  private def encoded(w: String): (Int, String) = {
    val hit = memo.get(w)
    if (hit != null) hit
    else {
      val syms = Bpe.encodeWord(w, ranks, rev)
      val v = (syms.length, syms.mkString(" "))
      if (memo.size < MemoCap) memo.put(w, v)
      v
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var total = 0L
    var head: String = ""
    var first = true
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          val (n, enc) = encoded(t.toString)
          total += n
          if (first) { head = enc; first = false }
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(total, UTF8String.fromString(head))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
