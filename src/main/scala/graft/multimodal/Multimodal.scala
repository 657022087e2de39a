package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as partition-local codecs.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, codec
  * signature) is real and tested; the codec bodies are '''deterministic
  * STUBS''' (this container ships no image/audio libraries) — swap
  * [[StubCodec]] for a real decoder (e.g. a JNI/FFI codec) in
  * production. The `mapPartitions` boundary is where a vectorized
  * Arrow/pandas-style batch codec would sit on a real cluster.
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

  /** STUB codec: derives deterministic pseudo-metadata from the bytes.
    * Everything downstream of this object would be identical with a real
    * decoder — only `decodeImage`/`sampleFrames` bodies change. */
  object StubCodec {
    def digest(bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(bytes).map("%02x".format(_)).mkString
    }

    def decodeImage(a: Asset): ImageFeatures = {
      val d = digest(a.content)
      // ??? real decoder goes here; stub derives stable fake dimensions.
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
      // ??? real decoder goes here; stub derives stable fake parameters.
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

    /** ??? real resampler goes here; the stub deterministically
      * truncates the payload proportionally to the target area and
      * stamps the new dimensions into the metadata. */
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
  def decodeImages(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "image")
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map(StubCodec.decodeImage)
      }
  }

  /** Partition-local audio decode — same shape as [[decodeImages]]. */
  def decodeAudio(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "audio")
      .mapPartitions(it => it.map(StubCodec.decodeAudio))
  }

  /** Frame sampling for video assets: flatMap each asset into frames. */
  def sampleFrames(assets: Dataset[Asset], everyN: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "video")
      .mapPartitions(it => it.flatMap(StubCodec.sampleFrames(_, everyN)))
  }

  /** Partition-local image resize: binary in, binary out, metadata
    * updated — the asset stays an opaque payload through the plan. */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets
      .filter(_.kind == "image")
      .mapPartitions(it => it.map(StubCodec.resizeImage(_, w, h)))
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
      .orderBy("kind")
}
