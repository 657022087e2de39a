package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{Hashing, TextFns}
import graft.functions.expressions.Tokens
import graft.operators.Sampling

/** The end-to-end corpus-preparation pipeline, composed from the
  * library's operators — what a training-data job actually runs, in one
  * call:
  *
  *  1. '''decontaminate''': drop corpus docs sharing ≥ N distinct
  *     shingles with the benchmark set (broadcast bench shingles,
  *     linear corpus scan),
  *  2. '''exact dedup''': keep the minimum id per content hash,
  *  3. '''near-dup dedup''': MinHash+LSH pairs → connected components →
  *     keep each cluster's canonical doc,
  *  4. '''quality filter''': token count, punctuation and repetition
  *     ratios (same rounded metrics as the q_text_quality operator),
  *  5. '''sample''': deterministic hash split to the target fraction.
  *
  * Every stage is deterministic, so the WHOLE pipeline is
  * oracle-checkable (q_pipeline_e2e mirrors it as one DuckDB query).
  * Scale: stages 1, 2, 4, 5 are linear scans/aggregates; stage 3 is the
  * bounded LSH join + O(diameter) label propagation. Nothing all-pairs,
  * nothing driver-side except the clustering round loop.
  */
object TrainingPipeline {

  final case class Params(
      benchMaxId: Long = 10, // doc_id < benchMaxId = the benchmark set
      contaminationMinShared: Int = 5,
      shingleK: Int = 3,
      minhashHashes: Int = 16,
      minhashBands: Int = 8,
      nearDupThreshold: Double = 0.8,
      minTokens: Int = 10,
      maxTokens: Int = 1000,
      maxPunctRatio: Double = 0.1,
      minDistinctRatio: Double = 0.3,
      sampleFraction: Double = 0.5)

  /** Run the full preparation over a `documents`-shaped frame
    * (doc_id, text, ...). Returns the prepared corpus rows (all input
    * columns, original content untouched). */
  def prepare(docs: DataFrame, p: Params = Params()): DataFrame = {
    Tokens.register(docs.sparkSession)

    // 1. benchmark decontamination
    val ex = Dedup
      .shingleRows(docs, "doc_id", "text", p.shingleK)
      .select(col("doc_id"), Hashing.md5Long(col("shingle")).as("h"))
    val bench = ex.filter(col("doc_id") < p.benchMaxId).select("h").distinct()
    val contaminated = ex
      .filter(col("doc_id") >= p.benchMaxId)
      .join(broadcast(bench), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= p.contaminationMinShared)
      .select("doc_id")
    val decon = docs
      .filter(col("doc_id") >= p.benchMaxId)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 2. exact dedup — keep the min id of every content group
    val keepExact = decon
      .groupBy(md5(col("text")).as("hh"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val exactKept = decon.join(keepExact, Seq("doc_id"), "left_semi")

    // 3. near-dup clustering, keep canonical survivors
    val pairs = Dedup.minhashLsh(
      exactKept,
      k = p.shingleK,
      numHashes = p.minhashHashes,
      bands = p.minhashBands,
      threshold = p.nearDupThreshold)
    val ndKept =
      Dedup.keepCanonical(exactKept, Dedup.duplicateClusters(pairs))

    // 4. quality filter — the q_text_quality metrics, same rounding, so
    // boundary decisions agree with the oracle
    val quality = ndKept
      .withColumn("tk", expr("graft_tokens(text)"))
      .filter(
        size(col("tk")) >= p.minTokens && size(col("tk")) <= p.maxTokens &&
          round(TextFns.punctRatio(col("text")), 6) < p.maxPunctRatio &&
          round(TextFns.distinctTokenRatioFrom(col("tk")), 6) > p.minDistinctRatio)
      .drop("tk")

    // 5. deterministic sample
    Sampling.sampleByHash(quality, "doc_id", p.sampleFraction)
  }
}
