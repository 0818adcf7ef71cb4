package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.expressions.{Bpe, BpeEncodeStats}

/** Real byte-pair-encoding tokenization over the corpus (SURVEY.md §2.3)
  * — upgrades text_tokens' "BPE-ish regex" stand-in to an actual learned
  * subword vocabulary (Sennrich et al. 2016), the tokenizer every LLM
  * pretraining pipeline trains before counting a single token budget.
  *
  * Scale shape (the 100 TB lens):
  *  - The ONLY corpus-scale work is the word-frequency pass: explode →
  *    partial-agg'd groupBy (the shuffle carries one row per distinct
  *    word per partition, not per token — textVocab's shape) → top-V via
  *    Spark's distributed TakeOrdered. V bounds the artifact: every real
  *    tokenizer trainer counts words first and trains on the frequency
  *    table (HuggingFace tokenizers, SentencePiece do exactly this), and
  *    top-32k types cover ~all token mass under Zipf.
  *  - Merge learning runs driver-side on that bounded artifact — a
  *    model-fitting step like the PQ codebook (Ann.Pq.train, accepted
  *    r06): O(V · avgLen · merges), milliseconds, independent of corpus
  *    size.
  *  - Encoding is one map-only native-expression pass over the corpus
  *    with the merge table shipped in the task closure; per-task
  *    memoization makes encode cost per distinct word per task.
  *
  * [rows] — iterative merge learning is not expressible in DuckDB SQL;
  * BpeSpec pins the paper's worked example (low/lower/newest/widest),
  * encode-equals-training-segmentation, and count invariants.
  */
object BpeTokenizer {

  private val TopV = 32768
  private val NumMerges = 200

  /** Bounded word-frequency artifact: top `topV` words by (count desc,
    * word asc). Model-sized collect — V rows, like the PQ training
    * sample. */
  private[graft] def wordFrequencies(
      s: SparkSession, d: String, topV: Int = TopV): Seq[(String, Long)] =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train merges on the corpus's own word frequencies, then encode every
    * document: (doc_id, n_words, n_bpe_tokens, head_bpe). The train step
    * runs inside the entry because the gate is hermetic (same posture as
    * ann_ivf_index building its index in-entry); a pipeline would train
    * once and reuse the merge table across every shard. */
  def textBpe(s: SparkSession, d: String): DataFrame = {
    val merges = Bpe.train(wordFrequencies(s, d), NumMerges)
    val stats = org.apache.spark.sql.graftshim.ColumnExpr.column(
      BpeEncodeStats(
        org.apache.spark.sql.graftshim.ColumnExpr.expression(
          split(col("text"), "\\s+")), merges))
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), size(tokens(col("text"))).as("n_words"),
        stats.as("b"))
      .select(col("doc_id"), col("n_words"),
        col("b.n_bpe_tokens").as("n_bpe_tokens"),
        col("b.head").as("head_bpe"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe" -> (textBpe _))

  /** Iterative merge learning is beyond SQL → rows-only gate + BpeSpec. */
  val oracles: Map[String, String] = Map.empty
}
