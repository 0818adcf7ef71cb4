package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline (SURVEY.md §2.3 mm_decode_pipeline).
  *
  * Pattern: media lives in opaque `binary` columns with typed metadata;
  * decode / feature-extract runs batched per partition over a typed
  * Dataset. The Spark-side plumbing — binary column construction, schema,
  * encoder round-trip, partition-batched processing, feature array output —
  * is real and tested; only the innermost byte→feature step is a STUB
  * (deterministic hash features), because no image/audio codecs ship in
  * this environment. Swapping the stub for a JNI/codec call changes ONE
  * function and nothing about the distributed shape.
  *
  * 100 TB shape: decode is per-partition map work with zero shuffle;
  * partitions are sized by the source's file splits, and the feature join
  * back to metadata is columnar. Batching (64 records) amortizes
  * per-call setup exactly like an inference batch would.
  */
object Multimodal {

  case class MmRecord(doc_id: Long, format: String, payload: Array[Byte])
  case class MmFeature(doc_id: Long, format: String, n_bytes: Long, feat: Array[Float])

  /** STUB decode: real systems decode image/audio bytes here; this derives
    * a deterministic 8-dim feature from the payload via MurmurHash3 so the
    * pipeline is testable end-to-end without codecs. */
  private def decodeStub(r: MmRecord): MmFeature = {
    val feat = Array.tabulate(8) { i =>
      val h = scala.util.hashing.MurmurHash3.bytesHash(r.payload, i)
      (h % 1000) / 1000.0f
    }
    MmFeature(r.doc_id, r.format, r.payload.length.toLong, feat)
  }

  /** binary payload column → batched per-partition decode → feature table.
    * The payload here is the document text encoded as bytes (the container
    * ships no media); an image table would differ only in `format`. */
  def mmDecodePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withPayload = graft.Tables.documents(s, d).select(
      col("doc_id"),
      lit("text/plain").as("format"),
      encode(col("text"), "UTF-8").as("payload"))
    val decoded = withPayload.as[MmRecord].mapPartitions { it =>
      it.grouped(64).flatMap { batch => // batched: amortizes decoder setup
        batch.iterator.map(decodeStub)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"),
        round(element_at(col("feat"), 1), 4).as("f0"),
        round(element_at(col("feat"), 8), 4).as("f7"))
  }

  /** frame sampling over a multi-frame binary payload: the payload is
    * treated as fixed-size frames (256 bytes — a real container would use
    * codec frame boundaries); every 4th frame is extracted with binary
    * `substring` and fingerprinted. Shape: sequence → posexplode → per-
    * frame column work — map-only, no shuffle, the frame-parallel layout a
    * video/audio pipeline needs (each frame row can fan out to its own
    * decode task). Frame extraction itself is codegen'd column work; only
    * the per-frame feature is the deterministic stub. [rows] */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    val frameBytes = 256
    val stride = 4
    val withPayload = graft.Tables.documents(s, d).select(
      col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    withPayload
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"),
        posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as(Seq("sample_idx", "frame_idx")))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .cast("long").as("frame_bytes"),
        xxhash64(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_fingerprint"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_pipeline" -> (mmDecodePipeline _),
    "mm_frame_sample" -> (mmFrameSample _))

  /** frame geometry (counts + sampled frame lengths) is SQL-expressible;
    * the fingerprint column is excluded from the oracle-checkable subset,
    * so mm_frame_sample gates on rows + the spec's byte-true assertions. */
  val oracles: Map[String, String] = Map.empty
}
