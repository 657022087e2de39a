package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.assetsFromDocuments(spark, SfDir)

  test("asset table carries binary content with typed metadata") {
    val a = assets.head()
    assert(a.content.nonEmpty)
    assert(a.meta.contains("source") && a.meta.contains("lang"))
    assert(Set("image", "audio", "video").contains(a.kind))
  }

  test("decodeImages runs the partition-local codec over image assets only") {
    val feats = Multimodal.decodeImages(assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 && f.channels == 3))
    // deterministic: same input → same digest
    val again = Multimodal.decodeImages(assets).collect()
    assert(feats.map(_.content_digest).sorted.sameElements(again.map(_.content_digest).sorted))
  }

  test("sampleFrames flat-maps videos into indexed frames") {
    val frames = Multimodal.sampleFrames(assets, everyN = 64).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_index >= 0))
  }

  test("decodeAudio runs the partition-local codec over audio assets only") {
    val feats = Multimodal.decodeAudio(assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.sample_rate >= 8000 && f.channels >= 1))
    assert(feats.forall(_.duration_ms >= 0))
    val expected = assets.filter(_.kind == "audio").count()
    assert(feats.length == expected)
  }

  test("resizeImages keeps payloads opaque and stamps target dimensions") {
    val resized = Multimodal.resizeImages(assets, 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.kind == "image"))
    assert(resized.forall(a =>
      a.meta("width") == "32" && a.meta("height") == "32"))
    assert(resized.forall(_.content.nonEmpty))
    // deterministic: same input -> same output bytes
    val again = Multimodal.resizeImages(assets, 32, 32).collect()
    def canon(as: Array[Multimodal.Asset]) =
      as.map(a => (a.asset_id, a.content.toSeq)).sortBy(_._1).toSeq
    assert(canon(resized) == canon(again))
  }

  test("assetStats aggregates per kind without leaving codegen") {
    val stats = Multimodal.assetStats(assets.toDF()).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(stats.map(_.getLong(1)).sum == assets.count())
  }

  test("imageNearDups plumbing over the stub codec: equal payloads pair at distance 0") {
    import spark.implicits._
    val base = assets.filter(_.kind == "image").head()
    val trio = spark.createDataset(Seq(
      base.copy(asset_id = 1L),
      base.copy(asset_id = 2L), // same bytes -> same stub hash
      base.copy(asset_id = 3L, content = base.content :+ 0x7f.toByte)))
    val pairs = Multimodal.imageNearDups(trio).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getInt(2) == 0 && r.getInt(3) == 0)
  }

  test("audioProfiles runs the stub codec over audio assets only") {
    val profiles = Multimodal.audioProfiles(assets).collect()
    assert(profiles.length == assets.filter(_.kind == "audio").count())
    assert(profiles.forall(p => p.peak >= 1 && p.rms > 0.0))
    assert(profiles.forall(p => p.rms <= p.peak.toDouble))
  }
}
