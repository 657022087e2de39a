package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, JvmCodec}

/** Behavioral tests for the REAL (JVM built-in) media codec: PNG/JPEG
  * decode + resize via javax.imageio, WAV via javax.sound.sampled,
  * animated-GIF frame sampling — media generated in-test, true
  * dimensions/duration asserted, run through the Spark Dataset ops. */
class JvmCodecSpec extends SparkSpec {

  private def pngAsset(id: Long, w: Int, h: Int): Asset = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Asset(id, "image", out.toByteArray, Map.empty)
  }

  /** PCM 16-bit little-endian WAV with `frames` sample frames. */
  private def wavAsset(id: Long, rate: Float, channels: Int, frames: Int): Asset = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    for (i <- pcm.indices) pcm(i) = ((i * 7) & 0xff).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    Asset(id, "audio", out.toByteArray, Map.empty)
  }

  private def gifAsset(id: Long, nFrames: Int, w: Int = 11, h: Int = 7): Asset = {
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (f * 97 + x * 13 + y) & 0xffffff)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    Asset(id, "video", out.toByteArray, Map.empty)
  }

  test("JvmCodec decodes real PNG dimensions through the Dataset op") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(pngAsset(1, 37, 23), pngAsset(2, 5, 9)))
    val feats = Multimodal
      .decodeImages(assets, JvmCodec)
      .collect()
      .map(f => f.asset_id -> f)
      .toMap
    assert(feats(1).width == 37 && feats(1).height == 23)
    assert(feats(2).width == 5 && feats(2).height == 9)
    assert(feats.values.forall(_.channels == 3))
    // pixel digest, not byte digest: distinct images differ
    assert(feats(1).content_digest != feats(2).content_digest)
  }

  test("JvmCodec resize produces a decodable image of the target size") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(pngAsset(1, 37, 23)))
    val resized = Multimodal.resizeImages(assets, 16, 9, JvmCodec)
    val feats = Multimodal.decodeImages(resized, JvmCodec).collect()
    assert(feats.length == 1)
    assert(feats.head.width == 16 && feats.head.height == 9)
    val meta = resized.head().meta
    assert(meta("width") == "16" && meta("height") == "9")
  }

  test("JvmCodec reads true WAV sample rate, channels, duration") {
    import spark.implicits._
    // 8000 Hz mono, 4000 frames -> exactly 500 ms
    val assets = spark.createDataset(
      Seq(wavAsset(1, 8000f, 1, 4000), wavAsset(2, 44100f, 2, 22050)))
    val feats = Multimodal
      .decodeAudio(assets, JvmCodec)
      .collect()
      .map(f => f.asset_id -> f)
      .toMap
    assert(feats(1).sample_rate == 8000 && feats(1).channels == 1)
    assert(feats(1).duration_ms == 500L)
    assert(feats(2).sample_rate == 44100 && feats(2).channels == 2)
    assert(feats(2).duration_ms == 500L)
  }

  test("JvmCodec samples every Nth frame of an animated GIF") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(gifAsset(1, 6)))
    val frames = Multimodal
      .sampleFrames(assets, everyN = 2, JvmCodec)
      .collect()
      .sortBy(_.frame_index)
    assert(frames.map(_.frame_index).toSeq == Seq(0, 2, 4))
    // frames hold different pixels -> different digests
    assert(frames.map(_.frame_digest).distinct.length == 3)
  }

  /** Smooth two-axis gradient — pHashes of resized copies stay close. */
  private def gradientAsset(id: Long, w: Int, h: Int, flip: Boolean = false): Asset = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = if (flip) 255 - (x * 255 / (w - 1)) else x * 255 / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Asset(id, "image", out.toByteArray, Map.empty)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("perceptual hash survives a resize that breaks the pixel digest") {
    val orig = gradientAsset(1, 64, 64)
    val resized = JvmCodec.resizeImage(orig, 40, 40).copy(asset_id = 2)
    val flipped = gradientAsset(3, 64, 64, flip = true)
    // the exact-pixel digest treats the resize as a different image...
    assert(JvmCodec.decodeImage(orig).content_digest !=
      JvmCodec.decodeImage(resized).content_digest)
    // ...the perceptual hashes barely move
    val (ho, hr, hf) = (
      JvmCodec.perceptualHash(orig),
      JvmCodec.perceptualHash(resized),
      JvmCodec.perceptualHash(flipped))
    assert(hamming(ho.dhash, hr.dhash) <= 4)
    assert(hamming(ho.ahash, hr.ahash) <= 4)
    // a left-right flipped gradient inverts every gradient sign
    assert(hamming(ho.dhash, hf.dhash) >= 48)
  }

  test("imageNearDups pairs a resized copy, not a different image") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(
      gradientAsset(1, 64, 64),
      JvmCodec.resizeImage(gradientAsset(1, 64, 64), 48, 48).copy(asset_id = 2),
      gradientAsset(3, 64, 64, flip = true)))
    val pairs = Multimodal.imageNearDups(assets, JvmCodec).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  /** WAV of silence, then a ±amp square wave, then silence. */
  private def squareWavAsset(
      id: Long, rate: Int, lead: Int, loud: Int, trail: Int, amp: Int): Asset = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val frames = lead + loud + trail
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until loud) {
      val v = if (i % 2 == 0) amp else -amp
      pcm((lead + i) * 2) = (v & 0xff).toByte
      pcm((lead + i) * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    Asset(id, "audio", out.toByteArray, Map.empty)
  }

  test("audio profile measures peak, RMS and the silence structure") {
    import spark.implicits._
    val assets = spark.createDataset(Seq(
      squareWavAsset(1, rate = 8000, lead = 800, loud = 1600, trail = 800, amp = 8000)))
    val p = Multimodal.audioProfiles(assets, JvmCodec).collect().head
    assert(p.sample_rate == 8000 && p.channels == 1 && p.n_frames == 3200L)
    assert(p.peak == 8000)
    assert(math.abs(p.rms - 8000.0 / math.sqrt(2.0)) < 1e-9)
    assert(p.lead_silence_ms == 100L) // 800 frames @ 8 kHz
    assert(p.trail_silence_ms == 100L)
    assert(p.silence_ratio == 0.5)
  }

  test("audio profile of all-silence reports full lead silence, zero peak") {
    val a = squareWavAsset(2, rate = 8000, lead = 400, loud = 0, trail = 0, amp = 0)
    val p = JvmCodec.audioProfile(a)
    assert(p.peak == 0 && p.rms == 0.0)
    assert(p.lead_silence_ms == 50L && p.trail_silence_ms == 0L)
    assert(p.silence_ratio == 1.0)
  }

  test("JvmCodec rejects undecodable payloads with the asset id") {
    val bogus = Asset(7, "image", Array[Byte](1, 2, 3), Map.empty)
    val e = intercept[IllegalArgumentException](JvmCodec.decodeImage(bogus))
    assert(e.getMessage.contains("7"))
    val e2 = intercept[IllegalArgumentException](JvmCodec.decodeAudio(bogus))
    assert(e2.getMessage.contains("7"))
  }
}
