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
        // an empty payload has ZERO frames and samples none — an
        // unguarded clamp to frame 0 would emit a phantom frame row
        // (frame_idx 0, 0 bytes) that downstream decoders would treat
        // as a real frame
        posexplode(when(nFrames > 0,
            sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast("array<int>")))
          .as(Seq("sample_idx", "frame_idx")))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .cast("long").as("frame_bytes"),
        xxhash64(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_fingerprint"))
  }

  case class AudioRecord(doc_id: Long, format: String, payload: Array[Byte])
  case class AudioFeature(doc_id: Long, format: String, n_bytes: Long,
      sample_rate: Int, channels: Int, n_samples: Long, duration_ms: Double,
      rms: Double, peak: Int, zero_crossings: Long)

  /** The JDK's WAV reader/writer, resolved ONCE per executor JVM through
    * the public `javax.sound.sampled.spi` ServiceLoader surface and then
    * called directly. `AudioSystem.getAudioInputStream`/`.write` re-walk
    * the provider registry under a LOCK on every call: 32 executor
    * threads decoding tiny in-memory WAVs serialized completely (32× the
    * work took LONGER than serial — 9.3 s vs 6.4 s in the r08 scratch
    * bench; direct provider calls: 0.03 s). Same class of trap as
    * ImageIO's temp-file cache above — JDK media statics are not
    * hot-path-safe. Falls back to the static entry points if no SPI
    * provider is found (never on a stock JDK). */
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: Option[javax.sound.sampled.spi.AudioFileReader] = None
    val probe = syntheticAudioVia(None, 0L)._2 // tiny WAV via static writer
    while (it.hasNext && found.isEmpty) {
      val r = it.next()
      try {
        r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe))
        found = Some(r)
      } catch { case _: Throwable => () }
    }
    found
  }
  private lazy val wavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: Option[javax.sound.sampled.spi.AudioFileWriter] = None
    while (it.hasNext && found.isEmpty) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = Some(w)
    }
    found
  }

  /** Deterministic synthetic audio for `docId`: 16-bit mono PCM with a
    * seeded integer waveform, really encoded as a WAV container via the
    * JDK's javax.sound.sampled writer. WAV PCM is lossless, so decoded
    * samples equal the generation formula exactly — the spec's ground
    * truth (same receipt structure as [[syntheticImage]]). */
  private[graft] def syntheticAudio(docId: Long): (String, Array[Byte]) =
    syntheticAudioVia(wavWriter, docId)

  private def syntheticAudioVia(
      writer: Option[javax.sound.sampled.spi.AudioFileWriter],
      docId: Long): (String, Array[Byte]) = {
    val n = audioSampleCount(docId)
    val rate = audioSampleRate(docId)
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = audioSample(docId, k)
      pcm(2 * k) = (s & 0xff).toByte // little-endian 16-bit
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writer match {
      case Some(w) =>
        w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      case None =>
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    }
    ("audio/wav", bos.toByteArray)
  }

  /** generation formula — shared with the spec */
  private[graft] def audioSampleCount(docId: Long): Int = 256 + (docId % 512).toInt
  private[graft] def audioSampleRate(docId: Long): Int =
    if (docId % 2 == 0) 16000 else 8000
  private[graft] def audioSample(docId: Long, k: Int): Short =
    (((docId * 31 + k.toLong * k.toLong * 17 + k * 1009) % 20011) - 10005).toShort

  /** The real decode: AudioSystem parses the WAV container (format chunk
    * → rate/channels/width, data chunk → PCM frames); features are
    * duration + signal stats over the actual decoded samples. */
  private def decodeAudio(r: AudioRecord): AudioFeature = {
    val in = new java.io.ByteArrayInputStream(r.payload)
    val ais = wavReader match {
      case Some(rd) => rd.getAudioInputStream(in)
      case None => javax.sound.sampled.AudioSystem.getAudioInputStream(in)
    }
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
      s"unexpected PCM layout for doc ${r.doc_id}")
    val bytes = ais.readAllBytes()
    val n = bytes.length / (2 * f.getChannels)
    var i = 0; var sumSq = 0.0; var peak = 0; var zc = 0L; var prev = 0
    while (i < n * f.getChannels) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (s < 0) != (prev < 0)) zc += 1
      prev = s
      i += 1
    }
    AudioFeature(r.doc_id, r.format, r.payload.length.toLong,
      f.getSampleRate.toInt, f.getChannels, n.toLong,
      n * 1000.0 / f.getSampleRate,
      if (n == 0) 0.0 else math.sqrt(sumSq / (n * f.getChannels)), peak, zc)
  }

  /** binary WAV payload column → batched per-partition JDK audio decode →
    * feature table (duration, RMS, peak, zero-crossing rate — the
    * loudness/speech-activity features an audio-corpus filter keys on).
    * Same zero-shuffle mapPartitions shape as the image pipeline. [rows] */
  def mmAudioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withPayload = graft.Tables.fanOut(graft.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (fmt, bytes) = syntheticAudio(id)
        AudioRecord(id, fmt, bytes)
      })
    // no per-batch decoder setup to amortize here (AudioSystem reader
    // registry is JVM-global), so a grouped(64) wrapper would be dead
    // weight — a codec pool would slot in as a grouped stage like the
    // image path documents
    val decoded = withPayload.mapPartitions(_.map(decodeAudio))
    decoded.toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("sample_rate"), col("channels"), col("n_samples"),
        round(col("duration_ms"), 3).as("duration_ms"),
        round(col("rms"), 3).as("rms"),
        col("peak"), col("zero_crossings"))
      .orderBy("doc_id")
  }

  case class ResizedFeature(doc_id: Long, width: Int, height: Int,
      r_width: Int, r_height: Int, mean_r: Float, mean_g: Float, mean_b: Float)

  /** Bilinear resample of a decoded image to (tw, th): per-channel means
    * over the resampled pixels, channels interpolated in double (no
    * per-pixel re-quantization — the mean is the feature, not the image).
    * Standard half-pixel-center mapping with edge clamp. Exposed for the
    * spec, which recomputes it INDEPENDENTLY from the generation formula
    * (no ImageIO/AWT on the truth side). */
  private[graft] def bilinearMeans(px: (Int, Int) => Int, w: Int, h: Int,
      tw: Int, th: Int): (Double, Double, Double) = {
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var ty = 0
    while (ty < th) {
      val sy = math.min(math.max((ty + 0.5) * h / th - 0.5, 0.0), h - 1.0)
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, h - 1); val fy = sy - y0
      var tx = 0
      while (tx < tw) {
        val sx = math.min(math.max((tx + 0.5) * w / tw - 0.5, 0.0), w - 1.0)
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, w - 1); val fx = sx - x0
        val (p00, p10, p01, p11) = (px(x0, y0), px(x1, y0), px(x0, y1), px(x1, y1))
        def ch(shift: Int): Double = {
          def c(p: Int) = ((p >> shift) & 0xff).toDouble
          (c(p00) * (1 - fx) + c(p10) * fx) * (1 - fy) +
            (c(p01) * (1 - fx) + c(p11) * fx) * fy
        }
        sr += ch(16); sg += ch(8); sb += ch(0)
        tx += 1
      }
      ty += 1
    }
    val n = (tw * th).toDouble
    (sr / n, sg / n, sb / n)
  }

  /** RESIZE: decode → bilinear resample to a fixed training geometry
    * (16×12 here) → per-channel means of the resampled image — the
    * normalize-geometry step a vision pipeline runs between decode and
    * feature extraction / embedding. Same 100 TB shape as the decode
    * stage: batched per-partition map work, zero shuffle. [rows] */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (tw, th) = (16, 12)
    val withPayload = graft.Tables.fanOut(graft.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (fmt, bytes) = syntheticImage(id)
        MmRecord(id, fmt, bytes)
      })
    val resized = withPayload.mapPartitions { it =>
      it.grouped(64).flatMap(_.iterator.map { r =>
        imageIoNoCache
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable ${r.format} payload for doc ${r.doc_id}")
        val (mr, mg, mb) = bilinearMeans(
          (x, y) => img.getRGB(x, y), img.getWidth, img.getHeight, tw, th)
        ResizedFeature(r.doc_id, img.getWidth, img.getHeight, tw, th,
          mr.toFloat, mg.toFloat, mb.toFloat)
      })
    }
    resized.toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("r_width"), col("r_height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_pipeline" -> (mmDecodePipeline _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_audio_features" -> (mmAudioFeatures _))

  /** decoded geometry/means depend on ImageIO (and the audio stats on
    * javax.sound), not SQL; the fingerprint column is likewise excluded —
    * these entries gate on rows + the specs' exact-stat assertions. */
  val oracles: Map[String, String] = Map.empty
}
