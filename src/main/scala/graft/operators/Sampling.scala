package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * All selections hash a stable id through the engine-portable
  * md5-derived family ([[graft.functions.Hashing]]), so a sample is
  * reproducible across runs, engines (the DuckDB oracle computes the
  * same buckets), cluster sizes, and data layouts — unlike
  * `DataFrame.sample`, whose output depends on partitioning and seed
  * plumbing. Selection is a pushdown-friendly filter: no shuffle, no
  * state, linear scan.
  */
object Sampling {

  private val Buckets = 10000L

  /** Stable bucket 0..9999 from the row's id. Null ids all hash as the
    * empty string — they land together in one deterministic bucket
    * instead of silently dropping out of BOTH sides of a split (a null
    * comparison filters the row everywhere). */
  def hashBucket(idCol: Column): Column =
    pmod(
      Hashing.md5Long(coalesce(idCol.cast("string"), lit(""))),
      lit(Buckets))

  /** Keep ~`fraction` of rows, chosen by id hash — deterministic,
    * disjoint from [[complement]] of the same fraction. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.filter(hashBucket(col(idCol)) < (fraction * Buckets).toLong)
  }

  /** The other side of [[sampleByHash]]'s split (e.g. train vs held-out). */
  def complement(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.filter(hashBucket(col(idCol)) >= (fraction * Buckets).toLong)
  }

  /** Weighted priority sampling (Duffield, Lund & Thorup, JACM'07):
    * each item gets priority `q = w / u` for a per-item uniform
    * `u ∈ (0, 1]`, and the sample is the top-k by priority — inclusion
    * probability ∝ weight (an item twice the weight is twice as likely
    * to outrank the threshold), reproducible on any cluster layout
    * because `u` derives from the id hash.
    *
    * Engine-exact by construction: `u = (h52 + 1) / 2^52` with a
    * 52-BIT hash (not the usual 60 — so `h+1` and the numerator
    * product stay ≤ 2^53 where doubles are exact integers), and the
    * only float operations are one multiply and one divide, both
    * IEEE-correctly-rounded everywhere — no ln/pow, whose last-ulp
    * differences across libm implementations would make top-k
    * membership engine-dependent. Scale: the top-k is a
    * TakeOrdered-style selection over one projection pass. */
  def priorityColumn(idCol: Column, weight: Column): Column = {
    val h52 = conv(substring(md5(idCol.cast("string")), 1, 13), 16, 10)
      .cast("long")
    (weight.cast("double") * lit(4503599627370496.0)) / (h52 + lit(1L))
  }

  /** DuckDB mirror of [[priorityColumn]] for oracle authors. */
  def prioritySql(idExpr: String, weightExpr: String): String = {
    val h = s"CAST(('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 13)) AS BIGINT)"
    s"(CAST($weightExpr AS DOUBLE) * 4503599627370496.0) / ($h + 1)"
  }

  /** Leakage-safe train/held-out split: the split hashes the near-dup
    * CLUSTER representative, not the doc id, so a near-duplicate pair
    * can never straddle the boundary — the classic held-out
    * contamination channel that plain id-hash splitting leaves open.
    * `clusters` is [[graft.dedup.Dedup.duplicateClusters]] output
    * `(id, comp)`; docs named in no near-dup pair split on their own
    * id. Adds `grp` (the hashed representative) and `split`
    * ('train' | 'heldout').
    *
    * Scale shape: one left equi-join of the corpus against the cluster
    * table (∝ docs that appear in any near-dup pair — usually a small
    * fraction, broadcast- or shuffle-joined by AQE as its real size
    * dictates) + the same stateless hash filter as [[sampleByHash]].
    * Same-cluster cohesion is structural (one `grp` per component), not
    * probabilistic. */
  def leakageSafeSplit(
      df: DataFrame,
      clusters: DataFrame,
      idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("grp", coalesce(col("comp"), col(idCol)))
      .withColumn(
        "split",
        when(hashBucket(col("grp")) < (fraction * Buckets).toLong, "train")
          .otherwise("heldout"))
      .drop("comp")
  }

  /** Fixed-size uniform sample per stratum: the `n` rows of each
    * `keyCol` group whose id-hash ranks lowest. Hash-rank ordering makes
    * it a uniform draw that is stable across engines and layouts (same
    * reproducibility argument as [[sampleByHash]]), unlike per-group
    * reservoir sampling whose result depends on encounter order.
    *
    * Scale shape: one shuffle on `keyCol`; `row_number <= n` gets
    * Spark's WindowGroupLimit pushdown, so every map partition forwards
    * at most `n` rows per group to the shuffle instead of the whole
    * stratum. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    // NULL ids hash to NULL and would sort NULLS FIRST into the top
    // ranks nondeterministically (the tiebreaker is NULL too) — the
    // same coalesce hashBucket applies keeps the draw deterministic
    val hid = coalesce(col(idCol).cast("string"), lit(""))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(Hashing.md5Long(hid), hid)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Deterministic global shuffle order for training reproducibility:
    * every row gets a stable position `pos` (0-based, dense) in the
    * md5-of-(id ++ salt) total order, plus the range-aligned `shard` it
    * falls in. Re-running on any cluster size, layout, or engine yields
    * the identical order; changing `salt` yields an independent
    * permutation (epoch reshuffle without rewriting data).
    *
    * Scale shape: NO global single-partition sort. The shard is the
    * leading byte range of the shuffle key, so (shard, key) order equals
    * global key order; positions come from a per-shard `row_number`
    * (one shuffle on `shard`) plus a broadcast cumulative-offset table
    * (≤ 256 rows — the only single-partition step is a window over
    * that tiny table). This is the standard distributed total-order
    * rank: sort locally per range, offset by the prefix sums. */
  def corpusShuffle(
      df: DataFrame,
      idCol: String,
      shards: Int = 16,
      salt: String = ""): DataFrame = {
    require(shards >= 1 && shards <= 256, "shards must be in [1, 256]")
    val keyed = df.select(
      col(idCol),
      md5(concat(col(idCol).cast("string"), lit(salt))).as("shuffle_key"))
    // leading byte of the key, mapped monotonically onto [0, shards):
    // shard is a function of the byte alone, so (shard, key) ordering
    // is exactly key ordering
    val shardCol = expr(
      s"CAST((CAST(conv(substring(shuffle_key, 1, 2), 16, 10) AS LONG) * $shards) DIV 256 AS INT)")
    val sharded = keyed.withColumn("shard", shardCol)
    val offsets = sharded
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "off",
        coalesce(
          sum("cnt").over(
            Window
              .orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("shard", "off")
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    sharded
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(offsets), Seq("shard"))
      .select(
        col(idCol),
        col("shuffle_key"),
        col("shard"),
        (col("off") + col("rn") - 1).as("pos"))
  }

  /** Source-weighted mixture: keep ~`weights(key)` of each `keyCol`
    * stratum (keys absent from `weights` are dropped). The weight
    * lookup compiles to a literal CASE — no join, no shuffle, the
    * filter reaches the scan. This is the "dataset mixing" step of a
    * training pipeline (e.g. upweight curated sources, downsample
    * crawl), deterministic like every selection here. */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(
      weights.values.forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    val cutoff = weights.foldLeft(lit(0L)) { case (acc, (k, w)) =>
      when(col(keyCol) === k, lit((w * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < cutoff)
  }
}
