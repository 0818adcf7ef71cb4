package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline (SURVEY.md §2.3 mm_decode_pipeline).
  *
  * Pattern: media lives in opaque `binary` columns with typed metadata
  * (`format`); decode / feature-extract runs batched per partition over a
  * typed Dataset. The decode is REAL since r05: payloads are PNG/BMP
  * images and the per-record step is a JDK ImageIO decode of the actual
  * bytes, emitting geometry (width/height) + per-channel pixel means —
  * the r02–r04 hash-feature stub is gone. The container ships no media
  * files, so the image BYTES are synthesized deterministically per
  * document (a seeded RGB pattern, then a real PNG/BMP encode); at the
  * decode step they are opaque compressed images like any crawl corpus'.
  *
  * 100 TB shape: generation and decode are per-partition map work with
  * zero shuffle; partitions are sized by the source's file splits.
  * Batching (64 records) amortizes per-call setup exactly like an
  * inference batch would; a GPU/codec pool would plug into the same
  * grouped-iterator seam.
  */
object Multimodal {

  case class MmRecord(doc_id: Long, format: String, payload: Array[Byte])
  case class MmFeature(doc_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, mean_r: Float, mean_g: Float, mean_b: Float)

  /** ImageIO's default stream cache spools every encode/decode through a
    * TEMP FILE — two file creations per tiny in-memory image made the
    * real decode ~25× slower than column work. Disable once per executor
    * JVM (evaluated via lazy val from both hot paths). */
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic synthetic image for `docId`: a small RGB gradient
    * pattern, really encoded as PNG (even ids) or BMP (odd ids) via
    * ImageIO. Both formats are lossless RGB, so decoded pixels equal the
    * generation formula exactly — the spec's ground truth. */
  private[graft] def syntheticImage(docId: Long): (String, Array[Byte]) = {
    imageIoNoCache
    val w = 8 + (docId % 9).toInt
    val h = 8 + (docId % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pix(docId, x, y, 1, 7, 13) << 16) |
          (pix(docId, x, y, 3, 11, 5) << 8) | pix(docId, x, y, 5, 3, 17))
        x += 1
      }
      y += 1
    }
    val fmt = if (docId % 2 == 0) "png" else "bmp"
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    (s"image/$fmt", bos.toByteArray)
  }

  /** channel value of the synthetic pattern — shared with the spec */
  private[graft] def pix(docId: Long, x: Int, y: Int, kd: Int, kx: Int, ky: Int): Int =
    ((docId * kd + x * kx + y * ky) % 256).toInt

  /** The real decode: ImageIO reads the compressed bytes; features are
    * geometry + per-channel means over the actual decoded pixels. */
  private def decodeImage(r: MmRecord): MmFeature = {
    imageIoNoCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable ${r.format} payload for doc ${r.doc_id}")
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    MmFeature(r.doc_id, r.format, r.payload.length.toLong, w, h,
      sr / n, sg / n, sb / n)
  }

  /** binary payload column → batched per-partition ImageIO decode →
    * feature table. Generation (synthetic corpus) and decode are separate
    * mapPartitions stages, so the decode stage sees exactly what it would
    * see reading a media table: (id, format, opaque bytes). */
  def mmDecodePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withPayload = graft.Tables.fanOut(graft.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (fmt, bytes) = syntheticImage(id)
        MmRecord(id, fmt, bytes)
      })
    val decoded = withPayload.mapPartitions { it =>
      it.grouped(64).flatMap { batch => // batched: amortizes decoder setup
        batch.iterator.map(decodeImage)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("doc_id")
  }

  /** frame sampling over a multi-frame binary payload: the payload is
    * treated as fixed-size frames (256 bytes — a real container would use
    * codec frame boundaries); every 4th frame is extracted with binary
    * `substring` and fingerprinted. Shape: sequence → posexplode → per-
    * frame column work — map-only, no shuffle, the frame-parallel layout a
    * video/audio pipeline needs (each frame row can fan out to its own
    * decode task). Frame extraction itself is codegen'd column work; only
    * the per-frame feature is a fingerprint. [rows] */
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

  /** decoded geometry/means depend on ImageIO, not SQL; the fingerprint
    * column is likewise excluded — both entries gate on rows + the spec's
    * exact pixel-stat assertions. */
  val oracles: Map[String, String] = Map.empty
}
