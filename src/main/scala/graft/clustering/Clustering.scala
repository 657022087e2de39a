package graft.clustering

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Distributed embedding clustering — fixed-iteration Lloyd's k-means
  * and the SemDeDup-style semantic near-dup pass built on it (Abbas et
  * al., "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023).
  *
  * Scale shape (the point of k-means for corpus curation): per Lloyd
  * round the corpus is ONE linear projection (k codegen'd dot products
  * per row against centroid literals — no join, no corpus shuffle) plus
  * ONE aggregate of k rows with map-side partials; only the k×dim
  * centroid table ever reaches the driver, exactly like Spark MLlib's
  * own KMeans control plane. [[semanticPairs]] then confines the
  * quadratic pair join inside clusters: n²/k per cluster instead of n²,
  * the SemDeDup trick that makes embedding dedup feasible at corpus
  * scale.
  *
  * Determinism: centroid updates are fixed-point means — each component
  * is quantized by `floor(x · 10⁷)` and summed exactly as int64, and the
  * mean is a single IEEE division of two exactly-representable values.
  * `floor` has no rounding ties (unlike a decimal cast's half-up /
  * half-even ambiguity), so a SQL engine replaying the same update
  * derives bit-identical centroids and therefore identical assignments —
  * which is what lets a k-means run be oracle-checked at all. The 10⁻⁷
  * quantization error is far below any clustering-relevant signal.
  */
object Clustering {

  /** Fixed-point scale for exact centroid sums (see class doc). At this
    * scale int64 sums hold ~10¹¹ unit-range vectors per cluster. */
  private val Q = 10000000L

  /** One centroid: id (its rank in the init order / group key), the
    * component array, and its euclidean norm (sequential-fold, matching
    * [[VectorFns.dot]]'s order). */
  final case class Centroid(id: Int, v: Array[Double]) {
    val nrm: Double = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
  }

  /** Cosine of `vec`/`nrmCol` against a centroid baked as a literal —
    * stays inside whole-stage codegen ([[VectorFns.dot]]). */
  private def centSim(vec: Column, nrm: Column, c: Centroid): Column =
    VectorFns.dot(vec, typedLit(c.v.toSeq)) /
      VectorFns.safeDen(nrm, lit(c.nrm))

  /** Project `(id, cluster, sim)` — argmax-cosine assignment against the
    * current centroids. Sims are materialized once in their own
    * projection; the argmax CASE chain breaks ties toward the LOWEST
    * centroid id (first match wins), mirroring the oracle's
    * `ORDER BY sim DESC, cent_id` rank. */
  private def assign(
      embs: DataFrame,
      id: String,
      vec: String,
      nrm: String,
      cents: Seq[Centroid]): DataFrame = {
    val simCols = cents.map(c => centSim(col(vec), col(nrm), c).as(s"s${c.id}"))
    val withSims = embs.select(col(id) +: col(vec) +: col(nrm) +: simCols: _*)
    // greatest() requires >= 2 children; one centroid (k=1, or cluster
    // collapse on a duplicate-heavy corpus head) means its sim IS the max
    val m =
      if (cents.size == 1) col(s"s${cents.head.id}")
      else greatest(cents.map(c => col(s"s${c.id}")): _*)
    val cluster = cents.tail
      .foldLeft(when(col(s"s${cents.head.id}") === m, lit(cents.head.id))) {
        (acc, c) => acc.when(col(s"s${c.id}") === m, lit(c.id))
      }
      .otherwise(lit(-1))
    withSims.select(
      col(id),
      col(vec),
      col(nrm),
      cluster.as("cluster"),
      m.as("sim"))
  }

  /** Recompute centroids as fixed-point means of their members: one
    * aggregate with `dim` exact int64 sums + a count (map-side partials,
    * k output rows), collected to the driver. Empty clusters simply
    * disappear (no members → no group), same as the oracle's group-by. */
  private def updateCentroids(
      assigned: DataFrame,
      vec: String,
      dim: Int): Seq[Centroid] = {
    val sums = (1 to dim).map(j =>
      sum(floor(element_at(col(vec), j) * lit(Q.toDouble)).cast("long"))
        .as(s"s$j"))
    val aggs = count(lit(1)).as("n") +: sums
    assigned
      .groupBy("cluster")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val n = r.getAs[Long]("n")
        val denom = (n * Q).toDouble
        Centroid(
          r.getAs[Int]("cluster"),
          (1 to dim).map(j => r.getAs[Long](s"s$j").toDouble / denom).toArray)
      }
      .sortBy(_.id)
      .toSeq
  }

  /** `iters` Lloyd rounds from a deterministic init (the `k` lowest-id
    * vectors), returning the final assignment `(id, cluster, sim)` with
    * `sim` the cosine to the assigned centroid, rounded to 6 dp.
    *
    * `embs` must carry `(id, vec array<double>, nrm)` (see
    * [[graft.similarity.Ann.withNorm]]) and is scanned `iters + 1`
    * times — persist/checkpoint it upstream at corpus scale. */
  def kmeansAssign(
      embs: DataFrame,
      id: String = "vec_id",
      vec: String = "v",
      nrm: String = "nrm",
      k: Int = 10,
      iters: Int = 2,
      dim: Int = 64): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    var cents = embs
      .orderBy(col(id))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => Centroid(i, r.getAs[Seq[Double]](vec).toArray) }
      .toSeq
    require(cents.nonEmpty, "kmeansAssign needs a non-empty corpus")
    for (_ <- 0 until iters)
      cents = updateCentroids(assign(embs, id, vec, nrm, cents), vec, dim)
    assign(embs, id, vec, nrm, cents)
      .select(
        col(id),
        col("cluster").cast("long").as("cluster"),
        round(col("sim"), 6).as("sim"))
  }

  /** [[kmeansAssign]] with `k` scaled to the corpus: one `count()` on
    * the (materialized) embedding table picks
    * `k = max(minK, ceil(n / targetClusterSize))`, holding the EXPECTED
    * cluster size constant as the corpus grows. That is what makes
    * co-cluster candidate volume LINEAR in n (Σ sizes² ≈ n ·
    * targetClusterSize when balanced) instead of n²/k-with-fixed-k —
    * the property [[graft.dedup.Dedup.embeddingNearDups]]' low-threshold
    * route depends on. The per-round assign cost n·k = n²/C is the
    * flat-quantizer tradeoff (SemDeDup's own regime; a 100 TB deployment
    * graduates to a hierarchical/IVF coarse quantizer for the assign,
    * same contract) — but it is all codegen'd literal dot products, so
    * the constant is tiny at any k this library meets in one job. */
  def kmeansAssignAuto(
      embs: DataFrame,
      id: String = "vec_id",
      vec: String = "v",
      nrm: String = "nrm",
      targetClusterSize: Int = 200,
      minK: Int = 10,
      iters: Int = 2,
      dim: Int = 64): DataFrame = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    val n = embs.count()
    val k = math.max(minK.toLong, (n + targetClusterSize - 1) / targetClusterSize)
    kmeansAssign(embs, id, vec, nrm, k.toInt, iters, dim)
  }

  /** SemDeDup semantic near-dup pairs: cosine ≥ `threshold` pairs
    * RESTRICTED to k-means co-cluster members. `assignments` is
    * [[kmeansAssign]] output; the pair join shuffles both sides by
    * cluster, so the quadratic blow-up is bounded per cluster (the
    * shuffle_hash hint keeps the self-join from broadcasting one side
    * and recomputing the assignment subplan, as in
    * [[graft.dedup.Dedup.minhashLsh]]). Returns
    * `(a_id, b_id, cluster, cos)` with `a_id < b_id`. */
  def semanticPairs(
      embs: DataFrame,
      assignments: DataFrame,
      id: String = "vec_id",
      vec: String = "v",
      nrm: String = "nrm",
      threshold: Double = 0.45): DataFrame = {
    val member = embs
      .select(col(id), col(vec), col(nrm))
      .join(assignments.select(col(id), col("cluster")), id)
      .hint("shuffle_hash")
    graft.dedup.Dedup.embeddingCosine(
      member,
      id,
      vec,
      nrm,
      threshold,
      restrictKey = Some("cluster"))
  }
}
