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

  /** The codec seam: everything downstream is identical whichever
    * implementation sits here. Must be Serializable — instances are
    * closed over by `mapPartitions` tasks. */
  trait MediaCodec extends Serializable {
    def decodeImage(a: Asset): ImageFeatures
    def sampleFrames(a: Asset, everyN: Int): Iterator[Frame]
    def decodeAudio(a: Asset): AudioFeatures
    def resizeImage(a: Asset, w: Int, h: Int): Asset

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
