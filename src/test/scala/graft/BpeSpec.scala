package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.Bpe

/** BPE tokenizer: merge learning pinned to the hand-computed Sennrich
  * worked example, encode == training segmentation, count invariants on
  * the real corpus entry. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  // the paper's corpus: low×5, lower×2, newest×6, widest×3
  private val paperFreq: Seq[(String, Long)] =
    Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge learning reproduces the hand-computed Sennrich example") {
    // under the last-char+</w> convention, hand-computed:
    //   pair counts round 1: (e,s)=9 ties (s,t</w>)=9 → lexicographic → (e,s)
    //   then (es,t</w>)=9; (l,o)=7; tie(6): (e,w)<(n,e)<(w,est</w>) → (e,w);
    //   tie(6): (ew,est</w>)<(n,ew) → (ew,est</w>)
    val merges = Bpe.train(paperFreq, 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"), ("ew", "est</w>")))
  }

  test("training stops when no pair repeats (minCount)") {
    val merges = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), 10)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("encode replays training segmentation for training words") {
    // 10 merges converge every training word to a single symbol
    val m10 = Bpe.train(paperFreq, 10)
    assert(Bpe.encodeWord("newest", m10).toSeq == Seq("newest</w>"))
    assert(Bpe.encodeWord("widest", m10).toSeq == Seq("widest</w>"))
    // greedy-lowest-rank replay on the 5-merge model, hand-traced:
    val m5 = Bpe.train(paperFreq, 5)
    assert(Bpe.encodeWord("newest", m5).toSeq == Seq("n", "ewest</w>"))
    assert(Bpe.encodeWord("low", m5).toSeq == Seq("lo", "w</w>"))
    // unseen word degrades gracefully to learned subwords + chars
    val enc = Bpe.encodeWord("lowest", m5)
    assert(enc.head == "lo" && enc.last == "est</w>")
  }

  test("encode pass is map-only: no data-keyed shuffle in the plan") {
    val plan = queries.BpeTokenizer.textBpe(spark, sf)
      .queryExecution.executedPlan.toString
    // the only Exchange allowed is fanOut's round-robin parallelism
    // spread — nothing keyed on data (no hash/range partitioning)
    assert(!plan.contains("hashpartitioning"),
      s"encode must not shuffle by key:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"encode must not sort-shuffle:\n$plan")
  }

  test("text_bpe entry: count invariants + determinism on sf0.001") {
    val a = queries.BpeTokenizer.textBpe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(a.nonEmpty)
    a.foreach { case (id, nWords, nBpe, head) =>
      // every word is at least one token and at most its character count
      assert(nBpe >= nWords, s"doc $id: $nBpe bpe < $nWords words")
      assert(head.nonEmpty || nWords == 0)
      // head encoding reassembles the first word + </w>
      if (nWords > 0) assert(head.replace(" ", "").endsWith(Bpe.Eow))
    }
    val b = queries.BpeTokenizer.textBpe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "non-deterministic")
    // merges actually compress: total bpe tokens strictly under total chars
    val totalBpe = a.map(_._3).sum
    val totalChars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.col("text"), "\\s+", ""))))
      .head().getLong(0)
    assert(totalBpe < totalChars, "BPE should compress below character count")
  }
}
