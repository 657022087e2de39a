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

  test("assetStats aggregates per kind without leaving codegen") {
    val stats = Multimodal.assetStats(assets.toDF()).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(stats.map(_.getLong(1)).sum == assets.count())
  }
}
