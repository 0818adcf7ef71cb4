package graft.queries

/** scratch micro-benchmark for the mm_audio hot path (single-threaded) */
object AudioPerfScratch {
  def main(args: Array[String]): Unit = {
    val n = 5000
    // warmup
    (0 until 500).foreach { i => Multimodal.syntheticAudio(i.toLong) }
    var t0 = System.nanoTime()
    val payloads = (0 until n).map(i => Multimodal.syntheticAudio(i.toLong))
    var t1 = System.nanoTime()
    println(f"synth: ${(t1 - t0) / 1e9}%.3f s for $n")
    // decode via AudioSystem, as decodeAudio does
    t0 = System.nanoTime()
    payloads.foreach { case (_, bytes) =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      ais.readAllBytes()
    }
    t1 = System.nanoTime()
    println(f"getAudioInputStream+read: ${(t1 - t0) / 1e9}%.3f s for $n")
    // header-parse cost alone
    t0 = System.nanoTime()
    payloads.foreach { case (_, bytes) =>
      javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
    }
    t1 = System.nanoTime()
    println(f"getAudioFileFormat: ${(t1 - t0) / 1e9}%.3f s for $n")

    // 32-thread contention check: same total work, parallel
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    t0 = System.nanoTime()
    val futs = (0 until 32).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = payloads.foreach { case (_, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          ais.readAllBytes()
        }
      })
    }
    futs.foreach(_.get())
    t1 = System.nanoTime()
    println(f"32-thread decode x32 work: ${(t1 - t0) / 1e9}%.3f s (serial would be ~${0.2 * 32}%.1f)")
    t0 = System.nanoTime()
    val futs2 = (0 until 32).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until n).foreach(i => Multimodal.syntheticAudio(i.toLong))
      })
    }
    futs2.foreach(_.get())
    t1 = System.nanoTime()
    println(f"32-thread synth x32 work: ${(t1 - t0) / 1e9}%.3f s")
    // provider resolved ONCE via the public SPI, then called directly
    val readers = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var wavReader: javax.sound.sampled.spi.AudioFileReader = null
    while (readers.hasNext && wavReader == null) {
      val r = readers.next()
      try {
        r.getAudioFileFormat(new java.io.ByteArrayInputStream(payloads.head._2))
        wavReader = r
      } catch { case _: Throwable => () }
    }
    println(s"wav reader provider: ${wavReader.getClass.getName}")
    t0 = System.nanoTime()
    val futs3 = (0 until 32).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = payloads.foreach { case (_, bytes) =>
          val ais = wavReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          ais.readAllBytes()
        }
      })
    }
    futs3.foreach(_.get())
    t1 = System.nanoTime()
    println(f"32-thread direct-provider decode x32 work: ${(t1 - t0) / 1e9}%.3f s")

    val writers = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var wavWriter: javax.sound.sampled.spi.AudioFileWriter = null
    while (writers.hasNext && wavWriter == null) {
      val w = writers.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        wavWriter = w
    }
    println(s"wav writer provider: ${wavWriter.getClass.getName}")
    t0 = System.nanoTime()
    val futs4 = (0 until 32).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until n).foreach { i =>
          val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
          val pcm = new Array[Byte](512)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 256L)
          val bos = new java.io.ByteArrayOutputStream()
          wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        }
      })
    }
    futs4.foreach(_.get())
    t1 = System.nanoTime()
    println(f"32-thread direct-provider synth x32 work: ${(t1 - t0) / 1e9}%.3f s")
    // same check for the IMAGE path: ImageIO.read static vs direct reader
    val imgPayloads = (0 until 1000).map(i => Multimodal.syntheticImage(i.toLong)._2)
    t0 = System.nanoTime()
    val futs5 = (0 until 32).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = imgPayloads.foreach { bytes =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null)
        }
      })
    }
    futs5.foreach(_.get())
    t1 = System.nanoTime()
    println(f"32-thread ImageIO.read x32 work (1000 imgs): ${(t1 - t0) / 1e9}%.3f s")
    pool.shutdown()
  }
}
