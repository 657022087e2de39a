package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as partition-local codecs.
  *
  * Two codecs sit behind the [[MediaCodec]] seam:
  *   - [[JvmCodec]] — a REAL decoder built only on JVM built-ins:
  *     `javax.imageio` (PNG/JPEG/GIF decode, Graphics2D resize,
  *     animated-GIF frame sampling) and `javax.sound.sampled` (WAV/AIFF
  *     headers). No external dependency.
  *   - [[StubCodec]] — deterministic pseudo-metadata from the payload
  *     bytes, for corpora whose "media" columns are synthetic (the test
  *     tables carry text bytes). Also documents the seam a JNI/FFI codec
  *     (e.g. ffmpeg) would fill for formats the JVM cannot read.
  *
  * The `mapPartitions` boundary is where a vectorized Arrow/pandas-style
  * batch codec would sit on a real cluster: one codec instance per
  * partition, rows streamed through it, no driver involvement.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  final case class Asset(
      asset_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      bytes_len: Long,
      content_digest: String)

  final case class Frame(
      asset_id: Long,
      frame_index: Int,
      frame_digest: String)

  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      channels: Int,
      duration_ms: Long,
      bytes_len: Long,
      content_digest: String)

  /** 64-bit perceptual fingerprints of the decoded pixels: `ahash`
    * (mean-threshold of an 8×8 gray thumbnail) and `dhash` (horizontal
    * gradient signs of a 9×8 one) — the standard cheap image near-dup
    * signatures (re-encode-, resize- and small-edit-stable, unlike a
    * byte or pixel digest). */
  final case class PerceptualHash(asset_id: Long, ahash: Long, dhash: Long)

  /** Sample-level audio profile: loudness + silence structure — the
    * trim/filter signals an audio-training pipeline gates on. */
  final case class AudioProfile(
      asset_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      peak: Int, // max |sample| over all channels (16-bit scale)
      rms: Double, // root-mean-square over all samples
      lead_silence_ms: Long,
      trail_silence_ms: Long,
      silence_ratio: Double) // fraction of frames below threshold

  /** The codec seam: everything downstream is identical whichever
    * implementation sits here. Must be Serializable — instances are
    * closed over by `mapPartitions` tasks. */
  trait MediaCodec extends Serializable {
    def decodeImage(a: Asset): ImageFeatures
    def sampleFrames(a: Asset, everyN: Int): Iterator[Frame]
    def decodeAudio(a: Asset): AudioFeatures
    def resizeImage(a: Asset, w: Int, h: Int): Asset
    def perceptualHash(a: Asset): PerceptualHash
    def audioProfile(a: Asset): AudioProfile

    protected def digest(bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(bytes).map("%02x".format(_)).mkString
    }
  }

  /** Real decoder on JVM built-ins only. Throws IllegalArgumentException
    * on undecodable payloads — at pipeline scale wrap the Dataset ops in
    * a Try and route failures to a dead-letter output instead of failing
    * the stage. */
  object JvmCodec extends MediaCodec {
    import java.io.ByteArrayInputStream

    private def readImage(a: Asset): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(a.content))
      require(img != null, s"asset ${a.asset_id}: undecodable image payload")
      img
    }

    /** Digest of the decoded pixels (dimensions + ARGB raster), so two
      * encodings of the same image agree. Streams the raster through
      * the digest one ROW at a time: a single `8 + w*h*4` buffer would
      * overflow Int (and allocate gigabytes) on very large scans —
      * exactly the assets a metadata pass most needs to survive. */
    private def digestPixels(img: java.awt.image.BufferedImage): String = {
      val (w, h) = (img.getWidth, img.getHeight)
      val md = java.security.MessageDigest.getInstance("MD5")
      val head = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h)
      md.update(head.array())
      val rowBuf = java.nio.ByteBuffer.allocate(w * 4)
      var y = 0
      while (y < h) {
        rowBuf.clear()
        img.getRGB(0, y, w, 1, null, 0, w).foreach(rowBuf.putInt)
        md.update(rowBuf.array())
        y += 1
      }
      md.digest().map("%02x".format(_)).mkString
    }

    def decodeImage(a: Asset): ImageFeatures = {
      val img = readImage(a)
      ImageFeatures(
        a.asset_id,
        img.getWidth,
        img.getHeight,
        img.getColorModel.getNumComponents,
        a.content.length.toLong,
        digestPixels(img))
    }

    /** Every `everyN`-th frame of a multi-frame container (animated GIF
      * is what javax.imageio can read; video proper needs an FFI codec
      * behind this same seam). */
    def sampleFrames(a: Asset, everyN: Int): Iterator[Frame] = {
      val iis = javax.imageio.ImageIO
        .createImageInputStream(new ByteArrayInputStream(a.content))
      // enter the try BEFORE any validation: an undecodable payload
      // must not leak the stream (and its ImageIO disk-cache temp
      // file) — the documented dead-letter pattern catches and keeps
      // going, so a leak per bad asset compounds at pipeline scale
      var reader: javax.imageio.ImageReader = null
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"asset ${a.asset_id}: no image reader for payload")
        reader = readers.next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n by math.max(everyN, 1))
          .map(i => Frame(a.asset_id, i, digestPixels(reader.read(i))))
          .iterator
      } finally {
        if (reader != null) reader.dispose()
        iis.close()
      }
    }

    def decodeAudio(a: Asset): AudioFeatures = {
      val ais =
        try javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(a.content))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"asset ${a.asset_id}: undecodable audio payload", e)
        }
      try {
        val fmt = ais.getFormat
        AudioFeatures(
          a.asset_id,
          fmt.getSampleRate.toInt,
          fmt.getChannels,
          duration_ms = (ais.getFrameLength * 1000.0 / fmt.getFrameRate).toLong,
          bytes_len = a.content.length.toLong,
          content_digest = digest(a.content))
      } finally ais.close()
    }

    /** Gray thumbnail of the decoded image: bilinear downscale to
      * (w, h), integer ITU-R 601 luma per cell. */
    private def grayGrid(
        src: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] = {
      val small = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      small.getRGB(0, 0, w, h, null, 0, w).map { rgb =>
        val r = (rgb >> 16) & 0xff
        val gg = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        (299 * r + 587 * gg + 114 * b) / 1000
      }
    }

    /** aHash (8×8 mean threshold) + dHash (9×8 horizontal gradient) of
      * the decoded pixels. Integer luma and strict `>` comparisons keep
      * the bits deterministic; both survive re-encoding and mild edits,
      * which a pixel digest by construction cannot. */
    def perceptualHash(a: Asset): PerceptualHash = {
      val img = readImage(a)
      val g8 = grayGrid(img, 8, 8)
      val mean = g8.map(_.toLong).sum / 64
      var ah = 0L
      var i = 0
      while (i < 64) { if (g8(i) > mean) ah |= (1L << i); i += 1 }
      val g9 = grayGrid(img, 9, 8)
      var dh = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g9(y * 9 + x + 1) > g9(y * 9 + x)) dh |= (1L << (y * 8 + x))
          x += 1
        }
        y += 1
      }
      PerceptualHash(a.asset_id, ah, dh)
    }

    /** |sample| below this counts as silence (~ −36 dBFS on the 16-bit
      * scale) — the standard speech-trim default. */
    val SilenceThreshold = 512

    /** Streams the decoded PCM once: peak, RMS, leading/trailing
      * silence, silent-frame ratio. Non-16-bit/big-endian inputs are
      * transcoded through AudioSystem's converter first, so the math is
      * always on signed 16-bit little-endian frames. Accumulators are
      * longs (sample² ≤ 2³⁰ — a day of 48 kHz stereo stays < 2⁶³). */
    def audioProfile(a: Asset): AudioProfile = {
      val raw =
        try javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(a.content))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"asset ${a.asset_id}: undecodable audio payload", e)
        }
      val want = new javax.sound.sampled.AudioFormat(
        raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
        true, false)
      val ais =
        if (raw.getFormat.matches(want)) raw
        else javax.sound.sampled.AudioSystem.getAudioInputStream(want, raw)
      try {
        val channels = want.getChannels
        val frameBytes = channels * 2
        val buf = new Array[Byte](frameBytes * 4096)
        var nFrames = 0L
        var peak = 0
        var sumSq = 0L
        var nSamples = 0L
        var firstLoud = -1L
        var lastLoud = -1L
        var silentFrames = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var off = 0
          while (off + frameBytes <= read) {
            var c = 0
            var frameMax = 0
            while (c < channels) {
              val lo = buf(off + c * 2) & 0xff
              val hi = buf(off + c * 2 + 1)
              val s = (hi << 8) | lo
              val abs = math.abs(s)
              if (abs > peak) peak = abs
              if (abs > frameMax) frameMax = abs
              sumSq += s.toLong * s
              nSamples += 1
              c += 1
            }
            if (frameMax <= SilenceThreshold) silentFrames += 1
            else {
              if (firstLoud < 0) firstLoud = nFrames
              lastLoud = nFrames
            }
            nFrames += 1
            off += frameBytes
          }
          read = ais.read(buf)
        }
        val rate = want.getSampleRate.toDouble
        val (leadMs, trailMs) =
          if (firstLoud < 0) ((nFrames * 1000.0 / rate).toLong, 0L)
          else (
            (firstLoud * 1000.0 / rate).toLong,
            ((nFrames - 1 - lastLoud) * 1000.0 / rate).toLong)
        AudioProfile(
          a.asset_id,
          want.getSampleRate.toInt,
          channels,
          nFrames,
          peak,
          rms =
            if (nSamples == 0) 0.0
            else math.sqrt(sumSq.toDouble / nSamples),
          lead_silence_ms = leadMs,
          trail_silence_ms = trailMs,
          silence_ratio =
            if (nFrames == 0) 0.0 else silentFrames.toDouble / nFrames)
      } finally { ais.close(); raw.close() }
    }

    /** Bilinear resize via Graphics2D, re-encoded as PNG. */
    def resizeImage(a: Asset, w: Int, h: Int): Asset = {
      val src = readImage(a)
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      a.copy(
        content = out.toByteArray,
        meta = a.meta ++ Map("width" -> w.toString, "height" -> h.toString))
    }
  }

  /** STUB codec: derives deterministic pseudo-metadata from the bytes —
    * for synthetic corpora and as the seam documentation for formats
    * that need an external (JNI/FFI) decoder. */
  object StubCodec extends MediaCodec {

    def decodeImage(a: Asset): ImageFeatures = {
      val d = digest(a.content)
      // a real decoder sits here in JvmCodec; the stub derives stable
      // fake dimensions so plumbing stays testable on text payloads.
      val w = 64 + (java.lang.Long.parseLong(d.substring(0, 4), 16) % 1024).toInt
      val h = 64 + (java.lang.Long.parseLong(d.substring(4, 8), 16) % 1024).toInt
      ImageFeatures(a.asset_id, w, h, 3, a.content.length.toLong, d)
    }

    def sampleFrames(a: Asset, everyN: Int): Iterator[Frame] = {
      val d = digest(a.content)
      val n = 1 + (a.content.length / math.max(everyN, 1)).toInt.min(16)
      (0 until n).iterator.map(i => Frame(a.asset_id, i, s"$d:$i"))
    }

    def decodeAudio(a: Asset): AudioFeatures = {
      val d = digest(a.content)
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      val rate = rates((java.lang.Long.parseLong(d.substring(0, 4), 16) % rates.length).toInt)
      val channels = 1 + (java.lang.Long.parseLong(d.substring(4, 6), 16) % 2).toInt
      AudioFeatures(
        a.asset_id,
        rate,
        channels,
        duration_ms = a.content.length.toLong * 1000 / (rate.toLong * channels * 2),
        bytes_len = a.content.length.toLong,
        content_digest = d)
    }

    /** Pseudo perceptual hash from the byte digest: equal payloads get
      * equal hashes (so the banding/verify plumbing is exercised), but
      * there is no pixel notion to be edit-stable over. */
    def perceptualHash(a: Asset): PerceptualHash = {
      val d = digest(a.content)
      PerceptualHash(
        a.asset_id,
        java.lang.Long.parseUnsignedLong(d.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(d.substring(16, 32), 16))
    }

    /** Pseudo audio profile consistent with [[decodeAudio]]'s fake
      * format fields. */
    def audioProfile(a: Asset): AudioProfile = {
      val f = decodeAudio(a)
      val nFrames = f.duration_ms * f.sample_rate / 1000
      val d = digest(a.content)
      val peak = 1 + (java.lang.Long.parseLong(d.substring(6, 10), 16) % 32767).toInt
      AudioProfile(
        a.asset_id, f.sample_rate, f.channels, nFrames, peak,
        rms = peak / math.sqrt(2.0), // sine-wave convention
        lead_silence_ms = 0L, trail_silence_ms = 0L, silence_ratio = 0.0)
    }

    /** Deterministically truncates the payload proportionally to the
      * target area and stamps the new dimensions into the metadata. */
    def resizeImage(a: Asset, w: Int, h: Int): Asset = {
      val src = decodeImage(a)
      val ratio = math.min(
        1.0,
        (w.toLong * h).toDouble / (src.width.toLong * src.height))
      val n = math.max(1, (a.content.length * ratio).toInt)
      a.copy(
        content = java.util.Arrays.copyOf(a.content, n),
        meta = a.meta ++ Map("width" -> w.toString, "height" -> h.toString))
    }
  }

  /** Outcome of a metadata strip: how much privacy-bearing container
    * data was removed (the pixel/entropy payload is never touched). */
  final case class StripReport(
      asset_id: Long,
      container: String, // "png" | "jpeg" | "other"
      removed_segments: Int,
      removed_bytes: Long,
      bytes_before: Long,
      bytes_after: Long)

  /** PNG ancillary chunk types that carry metadata, not pixels — the
    * privacy-strip set (textual chunks, timestamps, embedded EXIF).
    * Rendering-relevant ancillaries (tRNS transparency, gAMA, sRGB…)
    * are KEPT: stripping must never change what the image looks like. */
  private val PngMetaChunks = Set("tEXt", "zTXt", "iTXt", "tIME", "eXIf")

  /** Byte-level image metadata strip — the privacy pass of an image
    * training pipeline (EXIF GPS coordinates, camera serials, XMP
    * author blocks, editor comments). Works on the CONTAINER without
    * decoding: PNG chunks / JPEG segments are walked and the
    * metadata-bearing ones dropped, everything else — including the
    * entire compressed pixel / entropy-coded stream — is copied
    * verbatim, so the cleaned asset decodes bit-identically (spec:
    * pixel digest and perceptual hash unchanged). PNG: drops
    * [[PngMetaChunks]]. JPEG: drops APP1–APP13 (EXIF/XMP/Photoshop…)
    * and COM; APP0 (JFIF) and APP14 (Adobe color transform) are kept —
    * both affect DECODING, not privacy. Non-image or unrecognized
    * containers pass through untouched (report row says so: a strip
    * pass must be safe to run on a mixed asset table). Truncated or
    * out-of-sync containers copy the remainder verbatim rather than
    * guessing — never corrupt what you cannot parse. */
  def stripImageMetadata(a: Asset): (Asset, StripReport) = {
    val c = a.content
    val (container, out, segs, removed) =
      if (isPng(c)) { val (o, s, b) = stripPng(c); ("png", o, s, b) }
      else if (isJpeg(c)) { val (o, s, b) = stripJpeg(c); ("jpeg", o, s, b) }
      else ("other", c, 0, 0L)
    (
      a.copy(content = out),
      StripReport(a.asset_id, container, segs, removed, c.length.toLong, out.length.toLong))
  }

  private def isPng(c: Array[Byte]): Boolean =
    c.length > 8 && (c(0) & 0xff) == 0x89 &&
      c(1) == 'P' && c(2) == 'N' && c(3) == 'G'

  private def isJpeg(c: Array[Byte]): Boolean =
    c.length > 2 && (c(0) & 0xff) == 0xff && (c(1) & 0xff) == 0xd8

  private def stripPng(c: Array[Byte]): (Array[Byte], Int, Long) = {
    val out = new java.io.ByteArrayOutputStream(c.length)
    out.write(c, 0, 8) // signature
    var i = 8
    var segs = 0
    var bytes = 0L
    while (i + 8 <= c.length) {
      val len = ((c(i) & 0xff) << 24) | ((c(i + 1) & 0xff) << 16) |
        ((c(i + 2) & 0xff) << 8) | (c(i + 3) & 0xff)
      val total = 12L + len // len + type + data + crc
      if (len < 0 || i + total > c.length) {
        out.write(c, i, c.length - i) // truncated: verbatim tail
        i = c.length
      } else {
        val typ = new String(c, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (PngMetaChunks(typ)) { segs += 1; bytes += total }
        else out.write(c, i, total.toInt)
        i += total.toInt
      }
    }
    if (i < c.length) out.write(c, i, c.length - i)
    (out.toByteArray, segs, bytes)
  }

  private def stripJpeg(c: Array[Byte]): (Array[Byte], Int, Long) = {
    val out = new java.io.ByteArrayOutputStream(c.length)
    out.write(c, 0, 2) // SOI
    var i = 2
    var segs = 0
    var bytes = 0L
    var done = false
    while (!done && i < c.length) {
      if (i + 2 > c.length || (c(i) & 0xff) != 0xff) {
        out.write(c, i, c.length - i) // lost sync: verbatim tail
        done = true
      } else {
        // JPEG markers may be preceded by any number of 0xFF fill bytes
        // (ITU-T T.81 §B.1.1.2) — consume the run so a padded boundary
        // is not parsed as marker 0xFF with a bogus length. `m` is the
        // marker byte: first non-FF after the run; the run rides with
        // its segment (kept verbatim, or counted when stripped).
        var m = i + 1
        while (m < c.length && (c(m) & 0xff) == 0xff) m += 1
        if (m >= c.length) {
          out.write(c, i, c.length - i) // trailing fill: verbatim tail
          done = true
        } else {
          val marker = c(m) & 0xff
          val head = m + 1 - i // FF-run + marker byte
          if (marker == 0xda) { // SOS: entropy stream + EOI, verbatim
            out.write(c, i, c.length - i)
            done = true
          } else if (marker == 0xd9 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
            out.write(c, i, head) // standalone marker
            i += head
          } else if (m + 3 > c.length) {
            out.write(c, i, c.length - i)
            done = true
          } else {
            val len = ((c(m + 1) & 0xff) << 8) | (c(m + 2) & 0xff) // incl. itself
            val total = head + len
            if (len < 2 || i + total > c.length) {
              out.write(c, i, c.length - i)
              done = true
            } else {
              val strip = (marker >= 0xe1 && marker <= 0xed) || marker == 0xfe
              if (strip) { segs += 1; bytes += total }
              else out.write(c, i, total)
              i += total
            }
          }
        }
      }
    }
    (out.toByteArray, segs, bytes)
  }

  /** Dataset-level metadata strip: a pure partition-local projection
    * (no shuffle, no decode) over a mixed asset table — cleaned assets
    * paired with their [[StripReport]]s. */
  def stripMetadata(assets: Dataset[Asset]): Dataset[(Asset, StripReport)] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.map(stripImageMetadata))
  }

  /** Build a demo asset table from the documents corpus (text bytes as
    * opaque payloads) — exercises the exact schema/partitioning a real
    * media table would use. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[Asset]
  }

  /** Partition-local image decode: one codec instance per partition, rows
    * streamed through it (the shape a JNI decoder or Arrow batch codec
    * needs — no per-row setup, no driver involvement). */
  def decodeImages(
      assets: Dataset[Asset],
      codec: MediaCodec = StubCodec): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "image")
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map(codec.decodeImage)
      }
  }

  /** Partition-local audio decode — same shape as [[decodeImages]]. */
  def decodeAudio(
      assets: Dataset[Asset],
      codec: MediaCodec = StubCodec): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "audio")
      .mapPartitions(it => it.map(codec.decodeAudio))
  }

  /** Frame sampling for video assets: flatMap each asset into frames. */
  def sampleFrames(
      assets: Dataset[Asset],
      everyN: Int,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "video")
      .mapPartitions(it => it.flatMap(codec.sampleFrames(_, everyN)))
  }

  /** Partition-local image resize: binary in, binary out, metadata
    * updated — the asset stays an opaque payload through the plan. */
  def resizeImages(
      assets: Dataset[Asset],
      w: Int,
      h: Int,
      codec: MediaCodec = StubCodec): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "image")
      .mapPartitions(it => it.map(codec.resizeImage(_, w, h)))
  }

  /** Partition-local perceptual hashing — same shape as
    * [[decodeImages]]. */
  def perceptualHashes(
      assets: Dataset[Asset],
      codec: MediaCodec = StubCodec): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "image")
      .mapPartitions(it => it.map(codec.perceptualHash))
  }

  /** How many of the 8 byte-bands of `dhash` the pigeonhole join splits
    * into: pairs within hamming ≤ 7 ALWAYS share a band (8 bands can
    * absorb at most 7 differing bits without one being clean). */
  val PHashBands = 8

  /** Image near-dup pairs by perceptual hash: decode+hash once
    * (partition-local codec), then the SAME banded pigeonhole shape as
    * the SimHash text path — each 64-bit dhash splits into 8 byte
    * bands, candidates must share (band_index, band_value), and a
    * `bit_count(a XOR b)` verify keeps true near-dups. Lossless for
    * `maxHamming` ≤ 7; candidates are bucket-bounded, never
    * all-pairs. Returns (a_id, b_id, dhash_dist, ahash_dist). */
  def imageNearDups(
      assets: Dataset[Asset],
      codec: MediaCodec = StubCodec,
      maxHamming: Int = 6): DataFrame = {
    require(
      maxHamming < PHashBands,
      s"pigeonhole with $PHashBands bands is lossless only below $PHashBands")
    val h = perceptualHashes(assets, codec).toDF()
    val bands = h
      .select(
        col("asset_id"),
        col("ahash"),
        col("dhash"),
        explode(sequence(lit(0), lit(PHashBands - 1))).as("band"))
      .withColumn(
        "band_val",
        expr("shiftright(dhash, CAST(band * 8 AS INT)) & 255"))
    val a = bands.select(
      col("band"), col("band_val"),
      col("asset_id").as("a_id"), col("ahash").as("a_ahash"),
      col("dhash").as("a_dhash"))
    val b = bands.select(
      col("band"), col("band_val"),
      col("asset_id").as("b_id"), col("ahash").as("b_ahash"),
      col("dhash").as("b_dhash"))
    a.join(b.hint("shuffle_hash"), Seq("band", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        bit_count(col("a_dhash").bitwiseXOR(col("b_dhash"))).cast("int")
          .as("dhash_dist"),
        bit_count(col("a_ahash").bitwiseXOR(col("b_ahash"))).cast("int")
          .as("ahash_dist"))
      .distinct() // a pair may share several bands
      .filter(col("dhash_dist") <= maxHamming)
      .orderBy("a_id", "b_id")
  }

  /** Partition-local audio profiling — same shape as [[decodeAudio]]. */
  def audioProfiles(
      assets: Dataset[Asset],
      codec: MediaCodec = StubCodec): Dataset[AudioProfile] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "audio")
      .mapPartitions(it => it.map(codec.audioProfile))
  }

  /** Column-only metadata path (no codec): digest + size per asset —
    * stays fully in codegen. */
  def assetStats(assets: DataFrame): DataFrame =
    assets
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        count_distinct(md5(col("content"))).as("distinct_contents"))
      .transform(graft.operators.SortUtil.sortSmall(_, col("kind")))
}
