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
    // 1+2: per-row quality + language gates — map-only. PINNED above the
    // fan-out (r16 opt): PushDownPredicates otherwise sinks this fused
    // regex-heavy predicate below fanOut's round-robin exchange, i.e.
    // into the scan stage — which on a few-split source (one parquet
    // file here; one gzip shard in the wild) serializes the single most
    // expensive per-row pass of the pipeline into one task. The barrier
    // evaluates bit-identically (see PushdownBarrier); where fanOut
    // no-ops (already-wide source) the plan is unchanged.
    val kept = docs.filter(
      org.apache.spark.sql.graftshim.ColumnExpr.column(
        graft.expressions.PushdownBarrier(
          org.apache.spark.sql.graftshim.ColumnExpr.expression(
            Text.qualityScoreCol(col("text")) >= 0.3 &&
              Text.predLangCol(col("text")) =!= "und"))))
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

  /** FLIPPED to a hard oracle in r16: every stage is now engine-
    * reproducible — the quality/langid gates are the text_quality /
    * text_langid expressions, exact dedup groups by text, the near-dup
    * cluster map replays Dedup's shared minhash pair graph + recursive-
    * CTE closure, redaction is the text_pii_redact regex chain, and
    * chunk counting is arithmetic. One SQL, the whole pipeline. */
  val oracles: Map[String, String] = Map(
    "pipeline_end_to_end" ->
      raw"""WITH RECURSIVE ${Dedup.MinhashVerifiedCte},
         pr AS (SELECT a_id, b_id FROM verified WHERE jac >= 0.8),
         edges AS (SELECT a_id AS a, b_id AS b FROM pr
                   UNION ALL SELECT b_id, a_id FROM pr),
         reach AS (
           SELECT a AS id, b AS x FROM edges
           UNION
           SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.x),
         noncanon AS (
           SELECT id AS doc_id FROM reach GROUP BY id
           HAVING least(min(x), id) <> id),
         q AS (
           SELECT doc_id, lang, text FROM base
           WHERE floor((least(1.0, len(toks) / 100.0)
                   * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))
                            / CAST(length(text) AS DOUBLE))) * 10000.0 + 0.5)
                 / 10000.0 >= 0.3
             AND (CASE
                   WHEN len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) =
                        greatest(
                          len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))),
                          len(list_filter(toks, x -> x IN ('the','a','of','and','to'))),
                          len(list_filter(toks, x -> x IN ('el','los','las','y','de'))),
                          len(list_filter(toks, x -> x IN ('le','la','les','et','des'))),
                          len(list_filter(toks, x -> x IN ('的','是','了','和','在'))))
                   THEN 'de' ELSE 'known' END) <> 'und'),
         uniq AS (
           SELECT doc_id, lang, text FROM (
             SELECT q.*, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM q) WHERE rn = 1),
         canon AS (
           SELECT u.doc_id, u.lang, u.text FROM uniq u
           WHERE u.doc_id NOT IN (SELECT doc_id FROM noncanon)),
         red AS (
           SELECT lang,
                  regexp_replace(regexp_replace(regexp_replace(text,
                    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                    '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}', '<PHONE>', 'g'),
                    '[0-9]{4,}', '<NUM>', 'g') AS rtext
           FROM canon),
         ch AS (
           SELECT lang,
                  CAST(floor((len(list_filter(string_split_regex(rtext, '\s+'),
                    x -> len(x) > 0)) - 1) / 48.0) + 1 AS BIGINT) AS n_chunks
           FROM red)
         SELECT lang, count(*) AS n_docs, CAST(sum(n_chunks) AS BIGINT) AS n_chunks
         FROM ch GROUP BY lang ORDER BY lang""")
}
