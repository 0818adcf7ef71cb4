package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** The end-to-end corpus-cleaning pipeline — every stage a pretraining
  * data run performs, composed from the operators this library ships:
  *
  *   quality filter → language filter → exact dedup → near-dup cluster
  *   removal → PII redaction → fixed-size chunking → per-language stats
  *
  * One Spark job graph. The per-row stages (quality, langid, redact,
  * chunk-count) are pure column expressions fused into the scan
  * projection; the corpus-wide stages are one hash aggregate (exact
  * dedup) and one anti-join against the near-dup cluster map. At 100 TB
  * this is the realistic composition test: nothing in the composition
  * adds a shuffle beyond what each stage individually requires.
  */
object Pipeline {

  def pipelineEndToEnd(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), col("text"))
    // 1+2: per-row quality + language gates — map-only, fused in the scan
    val kept = docs.filter(
      Text.qualityScoreCol(col("text")) >= 0.3 &&
        Text.predLangCol(col("text")) =!= "und")
    // 3: exact dedup — smallest doc_id survives per content digest
    val uniq = kept
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("text")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.text").as("text"))
    // 4: near-dup removal — drop non-canonical members of minhash clusters
    val nonCanonical = Dedup.dedupCluster(s, d).select(col("doc_id"))
    val canon = uniq.join(nonCanonical, Seq("doc_id"), "left_anti")
    // 5+6: redact, then count 64/48 chunks of the redacted token stream
    val redacted = canon.withColumn("text", Text.piiRedactCol(col("text")))
    val withChunks = redacted.withColumn("n_chunks",
      (floor((size(tokens(col("text"))) - 1) / 48) + 1).cast("long"))
    withChunks.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("n_chunks"))
      .orderBy("lang")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_end_to_end" -> (pipelineEndToEnd _))

  /** near-dup stage (minhash clusters) is not SQL-expressible → rows-only;
    * PipelineSpec asserts the output invariants and determinism. */
  val oracles: Map[String, String] = Map.empty
}
