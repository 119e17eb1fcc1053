package graft

/** Typed multimodal decode plumbing: the mapPartitions pipeline runs
  * end-to-end — REAL javax.imageio pixel decode for image formats,
  * deterministic byte-statistics fallback elsewhere. */
class MultimodalSpec extends SparkSpecBase {

  /** Render a deterministic w×h RGB gradient and encode it with the JDK
    * writer for `fmt` ("png"/"bmp"/"gif"). Pixel (x,y) = exact known
    * channels, so expected luma is computable in the test. */
  private def renderImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) % 256 << 16) | ((y * 30) % 256 << 8) | ((x + y) * 20) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  private def expectedLuma(w: Int, h: Int): Double = {
    val sums = for (y <- 0 until h; x <- 0 until w) yield
      0.299 * ((x * 40) % 256) + 0.587 * ((y * 30) % 256) + 0.114 * (((x + y) * 20) % 256)
    sums.sum / (w * h)
  }

  test("image payloads take the REAL javax.imageio decode path, pixel-exact") {
    import spark.implicits._
    val recs = spark.createDataset(Seq(
      multimodal.Multimodal.MediaRecord(1L, renderImage(8, 6, "png"), "png", 1),
      multimodal.Multimodal.MediaRecord(2L, renderImage(5, 9, "bmp"), "bmp", 1),
      multimodal.Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3), "png", 1), // corrupt
      multimodal.Multimodal.MediaRecord(4L, renderImage(4, 4, "png"), "audio", 1))) // not an image fmt
    val feats = multimodal.Multimodal.decodeImages(recs).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).width == 8 && feats(1L).height == 6
      && feats(1L).n_px == 48)
    assert(math.abs(feats(1L).mean_luma - expectedLuma(8, 6)) < 1e-5,
      s"png luma ${feats(1L).mean_luma} vs ${expectedLuma(8, 6)}")
    assert(feats(2L).decoded && feats(2L).width == 5 && feats(2L).height == 9)
    assert(math.abs(feats(2L).mean_luma - expectedLuma(5, 9)) < 1e-5,
      s"bmp luma ${feats(2L).mean_luma} vs ${expectedLuma(5, 9)}")
    assert(!feats(3L).decoded && feats(3L).n_px == 0,
      "corrupt bytes must degrade, not throw")
    // decodeImages probes bytes regardless of declared fmt — a real PNG
    // under a wrong label still decodes (content wins over metadata)
    assert(feats(4L).decoded && feats(4L).width == 4)
  }

  test("image decompression bomb is rejected at the header, before pixel allocation") {
    // a syntactically valid PNG signature + IHDR declaring 10⁶×10⁶ px:
    // full decode would try to allocate ~4 TB; the header guard must
    // return None without touching pixels
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(ihdr)
    d.writeBytes("IHDR"); d.writeInt(1000000); d.writeInt(1000000)
    d.writeByte(8); d.writeByte(2); d.writeByte(0); d.writeByte(0); d.writeByte(0)
    dos.writeInt(13)
    val body = ihdr.toByteArray
    dos.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    dos.writeInt(crc.getValue.toInt)
    assert(multimodal.Multimodal.decodeImage(bos.toByteArray).isEmpty,
      "bomb-dims payload must be rejected at the header")
    // and a normal image still decodes with the guard in place
    assert(multimodal.Multimodal.decodeImage(renderImage(4, 4, "png")).isDefined)
  }

  /** Synthesize a WAV payload: `samples` are 16-bit signed PCM values,
    * written through the JDK's own WAV writer (little-endian, mono or
    * interleaved `channels`). */
  private def renderWav(samples: Array[Short], sampleRate: Float,
      channels: Int, bigEndian: Boolean = false): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, channels, 2 * channels, sampleRate, bigEndian)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bigEndian) { bytes(2 * i) = (s >> 8).toByte; bytes(2 * i + 1) = s.toByte }
      else { bytes(2 * i) = s.toByte; bytes(2 * i + 1) = (s >> 8).toByte }
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV payloads take the REAL javax.sound.sampled decode path, sample-exact") {
    import spark.implicits._
    // a 440-sample ramp plus a constant block: stats are hand-computable
    val ramp = Array.tabulate(440)(i => (i * 64 - 14080).toShort)
    val const = Array.fill(100)(16384.toShort)
    val stereo = Array.tabulate(64)(i =>
      (if (i % 2 == 0) 8192 else -8192).toShort) // L=+0.25, R=-0.25
    val recs = spark.createDataset(Seq(
      multimodal.Multimodal.MediaRecord(1L, renderWav(ramp, 8000f, 1), "wav", 1),
      multimodal.Multimodal.MediaRecord(2L, renderWav(const, 44100f, 1), "wav", 1),
      multimodal.Multimodal.MediaRecord(3L, renderWav(stereo, 16000f, 2), "wav", 1),
      multimodal.Multimodal.MediaRecord(4L, Array[Byte](82, 73, 70, 70), "wav", 1))) // truncated RIFF
    val feats = multimodal.Multimodal.decodeAudios(recs).collect()
      .map(f => f.doc_id -> f).toMap
    def stats(xs: Array[Short]): (Double, Double) = {
      val vs = xs.map(_ / 32768.0)
      (vs.map(math.abs).sum / vs.length,
        math.sqrt(vs.map(v => v * v).sum / vs.length))
    }
    val (ma1, rms1) = stats(ramp)
    assert(feats(1L).decoded && feats(1L).sample_rate == 8000
      && feats(1L).channels == 1 && feats(1L).n_frames_audio == 440)
    assert(math.abs(feats(1L).mean_abs - ma1) < 1e-5
      && math.abs(feats(1L).rms - rms1) < 1e-5,
      s"ramp stats ${feats(1L)} vs ($ma1, $rms1)")
    assert(feats(2L).decoded && feats(2L).sample_rate == 44100
      && math.abs(feats(2L).rms - 0.5) < 1e-5, "constant 16384 block has RMS 0.5")
    assert(feats(3L).decoded && feats(3L).channels == 2
      && feats(3L).n_frames_audio == 32
      && math.abs(feats(3L).rms - 0.25) < 1e-5, "stereo ±0.25 square has RMS 0.25")
    assert(!feats(4L).decoded && feats(4L).n_frames_audio == 0,
      "truncated RIFF must degrade, not throw")
  }

  test("decodeAll routes wav through the audio decoder (mean_level = RMS)") {
    import spark.implicits._
    val const = Array.fill(64)(16384.toShort)
    val recs = spark.createDataset(Seq(
      multimodal.Multimodal.MediaRecord(1L, renderWav(const, 8000f, 1), "wav", 1),
      multimodal.Multimodal.MediaRecord(2L, renderWav(const, 8000f, 1), "mp3", 1))) // no JVM codec
    val feats = multimodal.Multimodal.decodeAll(recs).collect()
      .map(f => f.doc_id -> f).toMap
    assert(math.abs(feats(1L).mean_level - 0.5) < 1e-5,
      s"wav fmt must surface decoded RMS, got ${feats(1L).mean_level}")
    // mp3 label (even over decodable bytes) stays on the declared fallback
    val wav = renderWav(const, 8000f, 1)
    val byteMean = wav.map(b => (b & 0xff).toDouble).sum / wav.length
    assert(math.abs(feats(2L).mean_level - byteMean) < 1e-5,
      "compressed-audio fmt must fall back to byte statistics")
  }

  test("decodeAll dispatches by format: luma for images, byte stats for the rest") {
    import spark.implicits._
    val png = renderImage(8, 6, "png")
    val recs = spark.createDataset(Seq(
      multimodal.Multimodal.MediaRecord(1L, png, "png", 1),
      multimodal.Multimodal.MediaRecord(2L, png, "audio", 1)))
    val feats = multimodal.Multimodal.decodeAll(recs).collect()
      .map(f => f.doc_id -> f).toMap
    assert(math.abs(feats(1L).mean_level - expectedLuma(8, 6)) < 1e-5,
      "png fmt must surface decoded luma")
    val byteMean = png.map(b => (b & 0xff).toDouble).sum / png.length
    assert(math.abs(feats(2L).mean_level - byteMean) < 1e-5,
      "non-image fmt must fall back to byte statistics")
    assert(feats(1L).byte_len == png.length && feats(2L).byte_len == png.length)
  }

  test("scanline features sample every stride-th row of the decoded image") {
    import spark.implicits._
    val recs = spark.createDataset(Seq(
      multimodal.Multimodal.MediaRecord(1L, renderImage(6, 10, "png"), "png", 1),
      multimodal.Multimodal.MediaRecord(2L, Array[Byte](9, 9), "audio", 1)))
    val lines = multimodal.Multimodal.scanlineFeatures(recs, stride = 4).collect()
    assert(lines.forall(_.doc_id == 1L), "non-images emit no scanlines")
    assert(lines.map(_.y).sorted.toSeq == Seq(0, 4, 8))
    lines.foreach { l =>
      val exp = (0 until 6).map { x =>
        0.299 * ((x * 40) % 256) + 0.587 * ((l.y * 30) % 256) + 0.114 * (((x + l.y) * 20) % 256)
      }.sum / 6
      assert(math.abs(l.mean_luma - exp) < 1e-5, s"scanline y=${l.y}")
    }
  }

  test("decode pipeline produces one feature row per record, deterministically") {
    val recs = multimodal.Multimodal.mediaRecords(spark, sf)
    val feats = multimodal.Multimodal.decodeAll(recs).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.byte_len > 0)
      assert(f.mean_level > 0 && f.mean_level < 255, s"mean_level ${f.mean_level}")
      assert(f.n_frames == f.byte_len / 100 + 1)
    }
    val again = multimodal.Multimodal.decodeAll(recs).collect()
    assert(feats.map(f => f.doc_id -> f.mean_level).toMap ==
      again.map(f => f.doc_id -> f.mean_level).toMap)
  }

  test("frame sampling emits ceil(len/stride) frames whose levels are the payload bytes") {
    val recs = multimodal.Multimodal.mediaRecords(spark, sf)
    val byDoc = multimodal.Multimodal.frameFeatures(recs).collect().groupBy(_.doc_id)
    val raw = recs.collect().map(r => r.doc_id -> r.payload).toMap
    assert(byDoc.keySet == raw.keySet)
    byDoc.foreach { case (id, frames) =>
      val payload = raw(id)
      assert(frames.length == (payload.length + 99) / 100)
      frames.foreach { f =>
        assert(f.offset == f.frame_idx * 100)
        assert(f.level == (payload(f.offset) & 0xff).toDouble)
      }
    }
  }

  test("payload metadata matches the typed records") {
    val meta = multimodal.Multimodal.multimodalMeta(spark, sf)
      .select("doc_id", "byte_len").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recs = multimodal.Multimodal.mediaRecords(spark, sf).collect()
    recs.foreach(r => assert(meta(r.doc_id) == r.payload.length.toLong))
  }

  test("binaryFile ingestion feeds the typed decode pipeline end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.img").toPath,
        Array.tabulate[Byte](250)(i => (i % 128).toByte))
      java.nio.file.Files.write(new java.io.File(dir, "b.img").toPath,
        Array[Byte](10, 20, 30))
      java.nio.file.Files.writeString(new java.io.File(dir, "skip.txt").toPath, "no")
      val recs = multimodal.Multimodal.mediaRecordsFromFiles(spark, dir.getPath, "*.img")
      val feats = multimodal.Multimodal.decodeAll(recs).collect()
      assert(feats.length == 2, "glob must keep only the .img payloads")
      val byLen = feats.map(f => f.byte_len -> f).toMap
      assert(byLen(3).mean_level == 20.0)
      assert(byLen(250).n_frames == 3) // 250 bytes at stride 100
      assert(recs.collect().forall(_.fmt == "img"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
