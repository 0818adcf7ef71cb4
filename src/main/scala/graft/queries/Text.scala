package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` (SURVEY.md §2.3): token
  * counting, quality scoring, language ID, winnowing fingerprints.
  *
  * All pure column expressions (no UDFs) — per-row work stays inside
  * whole-stage codegen, embarrassingly parallel, no shuffle at all until a
  * consumer aggregates. That is the 100 TB shape for per-document scoring:
  * a single scan pass, columns pruned to (doc_id, text).
  */
object Text {

  /** whitespace tokens + BPE-ish subword units (letter runs / digit runs /
    * single punctuation), both countable identically in DuckDB [oracle]. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .as("n_subword_tokens"))

  private val StopWords = Seq("the", "a", "of", "and", "to")

  /** Composite quality score as a pure column expression — single source
    * of truth for textQuality and the end-to-end pipeline. */
  def qualityScoreCol(text: Column): Column = {
    val nWords = size(tokens(text)).cast("double")
    val punct = size(regexp_extract_all(text, lit("[^a-z0-9 ]"), lit(0))).cast("double")
    val nChars = length(text).cast("double")
    Money.qround(least(lit(1.0), nWords / 100.0) * (lit(1.0) - punct / nChars), 4)
  }

  /** length / stopword / punctuation quality signals + a composite score —
    * the standard cheap pre-filter before expensive dedup at corpus scale. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast("double")
    val stopHits = size(filter(toks, t =>
      t.isin(StopWords.map(lit): _*))).cast("double")
    val punct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).cast("double")
    val nChars = length(col("text")).cast("double")
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_words"),
      Money.qround(stopHits / nWords, 4).as("stop_ratio"),
      Money.qround(punct / nChars, 4).as("punct_ratio"),
      qualityScoreCol(col("text")).as("quality_score"))
  }

  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "los", "las", "y", "de"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("的", "是", "了", "和", "在"))

  /** Predicted language as a pure column expression (argmax of profile
    * hits, alphabetical tie-break) — shared with the pipeline. */
  def predLangCol(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, sc), other) =>
      when(sc === best, lang).otherwise(other)
    }
  }

  /** stopword-profile language ID: count profile hits per language, argmax
    * with alphabetical tie-break. (A real system would add char n-gram
    * frequencies; the plumbing — per-language score columns, deterministic
    * argmax — is identical.) [oracle as of r16: plain list/CASE SQL] */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val scored = LangProfiles.foldLeft(Tables.documents(s, d).select(col("doc_id"), toks.as("toks"))) {
      case (df, (lang, words)) =>
        df.withColumn(s"s_$lang",
          size(filter(col("toks"), t => t.isin(words.map(lit): _*))))
    }
    val best = greatest(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = LangProfiles.foldRight(lit("und"): Column) { case ((lang, _), other) =>
      when(col(s"s_$lang") === best, lang).otherwise(other) // earliest (alphabetical) match wins
    }
    scored.select(col("doc_id"), pred.as("pred_lang"), best.as("score"))
  }

  /** winnowing fingerprints (3-word shingles, window 4): set size, min, and
    * an order-independent xor signature per document — one native map-only
    * pass, no shuffle (two-step select so the struct expression is
    * evaluated once, not once per extracted field). [oracle as of r16:
    * the shingle hash is a code-point polynomial mod 1e9+7 (see
    * WinnowFingerprint), so DuckDB replays hash → window-min → distinct
    * xor exactly] */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"),
        winnowFingerprint(split(col("text"), "\\s+"), 3, 4).as("w"))
      .select(col("doc_id"), col("w.n_fp").as("n_fp"),
        col("w.fp_min").as("fp_min"), col("w.fp_sig").as("fp_sig"))

  /** fixed-size token chunking with overlap (size 64, stride 48) — the
    * standard pre-tokenization step for LLM training shards. One chunk row
    * per (doc, window); chunks start at 0, 48, 96, ... so consecutive
    * chunks share 16 tokens. Pure per-doc column work + posexplode: no
    * shuffle at all — at 100 TB this is a single map pass. [oracle] */
  def textChunk(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    // zero-token docs chunk to an EMPTY array, matching the oracle's
    // empty range: an unguarded sequence(0, -1) counts DOWN (Spark's
    // default step) and would emit two phantom chunk rows per empty doc
    val chunks = when(size(toks) > 0,
      transform(
        sequence(lit(0), floor((size(toks) - 1) / 48).cast("int")),
        i => concat_ws(" ", slice(toks, i * 48 + 1, lit(64)))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"), col("chunk_text"))
  }

  /** corpus vocabulary: global word frequencies, top 100 (count desc, word
    * asc tie-break). explode → partial-agg'd count — the shuffle carries
    * one row per distinct word per partition, not one per token. [oracle] */
  def textVocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(100)

  /** PII redaction — the standard scrub pass before corpus release:
    * email / phone-shaped / 4+-digit-run patterns replaced with typed
    * sentinels, plus per-doc counts of each. Pure regexp column work
    * (patterns chosen to behave identically under Java regex and RE2 so
    * the DuckDB oracle can verify byte-for-byte: no lookaround, no
    * backrefs). Map-only at any scale. [oracle] */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** PII redaction as a pure column expression (shared with the
    * end-to-end pipeline). */
  def piiRedactCol(text: Column): Column = {
    val phone = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
    val longDigits = "[0-9]{4,}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        phone, "<PHONE>"),
      longDigits, "<NUM>")
  }

  def textPiiRedact(s: SparkSession, d: String): DataFrame = {
    val redacted = piiRedactCol(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$EmailRe', 0)")).as("n_emails"),
      length(redacted).as("n_chars_redacted"),
      substring(redacted, 1, 80).as("head_redacted"))
  }

  /** Bigram language-model quality score — the perplexity-proxy filter
    * every pretraining pipeline runs: score(doc) = mean over bigrams of
    * log P(w₂|w₁) under add-one smoothing, with corpus counts estimated
    * from the corpus itself. Two-phase: (1) global unigram/bigram counts
    * (explode → partial-agg'd groupBy on hashed ids — the shuffle carries
    * one row per DISTINCT n-gram per partition, not per token); (2)
    * per-doc scoring joins the exploded bigram stream against the counts —
    * with NO broadcast hint: a forced broadcast of an open-vocabulary
    * bigram dictionary (billions of distinct bigrams at 100 TB) OOMs the
    * driver, so Catalyst/AQE picks broadcast only when the measured count
    * size is under the threshold and shuffle-joins otherwise (r02 verdict
    * scale-killer #1; PipelineSpec asserts the SortMergeJoin fallback
    * under a lowered threshold). Per-doc
    * mean uses Money-style integer micro-log units so the result is
    * bit-stable under any partitioning. [oracle as of r16: counts group
    * by hashed n-grams ≡ by n-gram strings (64-bit collisions
    * negligible), ln/round/micro-unit arithmetic is engine-identical,
    * and the mean uses the shared qround form] */
  def textLmScore(s: SparkSession, d: String): DataFrame = {
    val (out, docs) = lmScorePlan(s, d)
    // materialize, then release the tokenized pin: the gate/bench suite
    // runs 86 queries in one session, and a leaked MEMORY_AND_DISK frame
    // bleeds into every later query (the Dedup treatment, ADVICE r04;
    // text_lm_score was the last holdout — r05 What's-wrong #3)
    val result = out.localCheckpoint()
    docs.unpersist(blocking = false)
    result
  }

  /** Un-materialized plan + its pinned input. Separate so PipelineSpec
    * can assert the JOIN STRATEGY on the real plan — the localCheckpoint
    * in [[textLmScore]] replaces the executed plan with an RDD scan. */
  private[graft] def lmScorePlan(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val toks = split(col("text"), "\\s+")
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), ngramIds(toks, 1).as("ugs"), ngramIds(toks, 2).as("bgs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniCounts = docs.select(explode(col("ugs")).as("ug"))
      .groupBy("ug").agg(count(lit(1)).as("cu"))
    val biCounts = docs.select(explode(col("bgs")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val perBigram = docs
      .select(col("doc_id"), col("ugs"), posexplode(col("bgs")).as(Seq("pos", "bg")))
      .select(col("doc_id"), col("bg"),
        element_at(col("ugs"), col("pos") + 1).as("ug"))
      .join(biCounts, "bg")
      .join(uniCounts, "ug")
      .crossJoin(broadcast(vocab)) // 1-row scalar: always broadcast
      // add-one smoothed conditional log-prob, in integer micro-units
      .select(col("doc_id"),
        round(log((col("cb") + 1).cast("double") / (col("cu") + col("v"))) * 1000000)
          .cast("long").as("lp_micro"))
    val out = perBigram.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // qround (floor form) = the oracle's rounding exactly; the mean
        // is NEGATIVE (log-probs), where BigDecimal HALF_UP and the
        // floor form diverge — cross-engine consistency wins (r16)
        Money.qround(sum(col("lp_micro")) / count(lit(1)) / 1000000.0, 4)
          .as("mean_logprob"))
      .orderBy("doc_id")
    (out, docs)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_lm_score" -> (textLmScore _),
    "text_pii_redact" -> (textPiiRedact _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_chunk" -> (textChunk _),
    "text_vocab" -> (textVocab _))

  val oracles: Map[String, String] = Map(
    "text_lm_score" ->
      // the bigram LM replayed: per-position bigram stream, global
      // unigram/bigram counts, add-one smoothing, natural log in integer
      // micro-units, qround(4) mean. Counts run on n-gram STRINGS —
      // equal to the engine's hashed-id grouping up to 64-bit collisions.
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         uni AS (SELECT unnest(toks) AS w FROM t),
         bi AS (
           SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
           FROM t, unnest(range(1, len(toks))) AS u(i)),
         ucount AS (SELECT w, count(*) AS cu FROM uni GROUP BY w),
         bcount AS (SELECT bg, count(*) AS cb FROM bi GROUP BY bg),
         v_t AS (SELECT count(*) AS v FROM ucount),
         per AS (
           SELECT b.doc_id,
                  CAST(round(ln((bc.cb + 1) / CAST(uc.cu + v_t.v AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp
           FROM bi b JOIN bcount bc USING (bg)
                     JOIN ucount uc ON uc.w = b.w1, v_t)
         SELECT doc_id, count(*) AS n_bigrams,
                floor((CAST(sum(lp) AS DOUBLE) / count(*) / 1000000.0)
                  * 10000.0 + 0.5) / 10000.0 AS mean_logprob
         FROM per GROUP BY doc_id ORDER BY doc_id""",
    "text_fingerprint" ->
      // winnowing replayed with list lambdas: per-word code-point
      // polynomial (seed 7, ×131), 3-word shingle fold (seed 11,
      // ×1000003), both mod 1e9+7; window-4 mins; distinct → count /
      // min / xor. Short docs (< n words) hash their whole token list
      // as ONE shingle; empty docs reduce to the bare seed (11) —
      // identical edge shapes to the native expression.
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         wh AS (
           SELECT doc_id,
                  list_transform(toks, tok ->
                    list_reduce(list_prepend(CAST(7 AS BIGINT),
                      list_transform(range(1, length(tok) + 1),
                        c -> CAST(unicode(tok[c]) AS BIGINT))),
                      (a, b) -> (a * 131 + b) % 1000000007)) AS whs
           FROM t),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(whs) < 3 THEN
                    [list_reduce(list_prepend(CAST(11 AS BIGINT), whs),
                       (a, b) -> (a * 1000003 + b) % 1000000007)]
                  ELSE
                    list_transform(range(0, len(whs) - 2), s ->
                      list_reduce(list_prepend(CAST(11 AS BIGINT), whs[s + 1 : s + 3]),
                        (a, b) -> (a * 1000003 + b) % 1000000007))
                  END AS shs
           FROM wh),
         mn AS (
           SELECT doc_id,
                  list_transform(
                    range(0, CASE WHEN len(shs) < 4 THEN 1 ELSE len(shs) - 3 END),
                    e -> list_min(shs[e + 1 : e + 4])) AS mins
           FROM sh)
         SELECT doc_id,
                len(list_distinct(mins)) AS n_fp,
                list_min(mins) AS fp_min,
                list_reduce(list_distinct(mins), (a, b) -> xor(a, b)) AS fp_sig
         FROM mn""",
    "text_langid" ->
      // the full argmax replayed: per-language profile-hit counts over
      // the same whitespace tokens, greatest() + the same first-match
      // (alphabetical) tie-break order as predLangCol's when-chain
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         s AS (
           SELECT doc_id,
                  len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
                  len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS s_en,
                  len(list_filter(toks, x -> x IN ('el','los','las','y','de'))) AS s_es,
                  len(list_filter(toks, x -> x IN ('le','la','les','et','des'))) AS s_fr,
                  len(list_filter(toks, x -> x IN ('的','是','了','和','在'))) AS s_zh
           FROM t),
         g AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best FROM s)
         SELECT doc_id,
                CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                     WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                     WHEN s_zh = best THEN 'zh' ELSE 'und' END AS pred_lang,
                CAST(best AS INT) AS score
         FROM g""",
    "text_pii_redact" ->
      """SELECT doc_id,
                len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
                length(regexp_replace(regexp_replace(regexp_replace(text,
                  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                  '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}', '<PHONE>', 'g'),
                  '[0-9]{4,}', '<NUM>', 'g')) AS n_chars_redacted,
                substring(regexp_replace(regexp_replace(regexp_replace(text,
                  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                  '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}', '<PHONE>', 'g'),
                  '[0-9]{4,}', '<NUM>', 'g'), 1, 80) AS head_redacted
         FROM documents""",
    "text_tokens" ->
      """SELECT doc_id,
                len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS n_ws_tokens,
                len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subword_tokens
         FROM documents""",
    "text_quality" ->
      """SELECT doc_id,
                length(text) AS n_chars,
                len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS n_words,
                floor((len(list_filter(string_split_regex(text, '\s+'),
                          t -> t IN ('the','a','of','and','to')))
                      / CAST(len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
                floor((len(regexp_extract_all(text, '[^a-z0-9 ]'))
                      / CAST(length(text) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                floor((least(1.0, len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) / 100.0)
                      * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))
                               / CAST(length(text) AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS quality_score
         FROM documents""",
    "text_chunk" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           FROM documents)
         SELECT doc_id, i AS chunk_id,
                array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text
         FROM t, unnest(range(0, CAST(floor((len(toks) - 1) / 48) AS BIGINT) + 1)) AS u(i)""",
    "text_vocab" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS word
               FROM documents)
         GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""")
}
