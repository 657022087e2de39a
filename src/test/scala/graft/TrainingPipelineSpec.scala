package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TrainingPipeline

/** End-to-end corpus preparation: each stage's invariant asserted on
  * the real documents table. */
class TrainingPipelineSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$SfDir/documents.parquet")
  private lazy val prepared = TrainingPipeline.prepare(docs)

  test("prepared corpus is a strict, non-empty subset of the input") {
    val n = prepared.count()
    assert(n > 0 && n < docs.count())
  }

  test("no benchmark docs and no exact duplicates survive") {
    assert(prepared.filter(col("doc_id") < 10).count() == 0)
    val texts = prepared.select("text").count()
    val distinctTexts = prepared.select("text").distinct().count()
    assert(texts == distinctTexts)
  }

  test("every surviving doc passes the quality gates") {
    import graft.functions.TextFns
    val bad = prepared
      .withColumn("tk", TextFns.tokens(col("text")))
      .filter(
        size(col("tk")) < 10 || size(col("tk")) > 1000 ||
          round(TextFns.punctRatio(col("text")), 6) >= 0.1 ||
          round(TextFns.distinctTokenRatioFrom(col("tk")), 6) <= 0.3)
    assert(bad.count() == 0)
  }

  test("the pipeline is deterministic end to end") {
    val a = prepared.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TrainingPipeline
      .prepare(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("near-dup survivors are cluster-canonical (no surviving pair)") {
    import graft.dedup.Dedup
    // re-running the near-dup detector on the OUTPUT must find no pairs
    // above the pipeline's threshold among surviving docs
    val pairs = Dedup.minhashLsh(
      prepared.select("doc_id", "text"),
      k = 3, numHashes = 16, bands = 8, threshold = 0.8)
    assert(pairs.count() == 0)
  }
}
