package graft

import org.apache.spark.sql.functions._

import graft.clustering.Clustering
import graft.dedup.Dedup
import graft.functions.VectorFns
import graft.similarity.Ann

/** Behavioral guards for k-means + SemDeDup (graft.clustering): Lloyd
  * monotonicity, assignment shape, and equivalence of the semantic pair
  * pass to the all-pairs baseline restricted to co-cluster members. */
class ClusteringSpec extends SparkSpec {

  private lazy val embs = Ann
    .withNorm(
      spark.read
        .parquet(s"$SfDir/embeddings.parquet")
        .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v")),
      "v")
    .localCheckpoint()

  private def avgSim(iters: Int): Double =
    Clustering
      .kmeansAssign(embs, k = 10, iters = iters)
      .agg(avg("sim"))
      .head()
      .getDouble(0)

  test("kmeans assigns every vector exactly once, clusters in range") {
    val a = Clustering.kmeansAssign(embs, k = 10, iters = 2)
    val n = embs.count()
    assert(a.count() == n)
    assert(a.select("vec_id").distinct().count() == n)
    val mm = a
      .agg(
        min("cluster"),
        max("cluster"),
        min("sim"),
        max("sim"))
      .head()
    assert(mm.getLong(0) >= 0 && mm.getLong(1) < 10)
    assert(mm.getDouble(2) >= -1.0 - 1e-9 && mm.getDouble(3) <= 1.0 + 1e-9)
  }

  test("two-level quantizer: every vector assigned once, deterministic, clones co-cluster, sizes ≈ target") {
    // force the two-level route at test scale: flatMaxK below auto-k
    val target = 50
    val a = Clustering.kmeansAssignAuto(
      embs, targetClusterSize = target, minK = 10, iters = 2, flatMaxK = 4)
    val n = embs.count()
    assert(a.count() == n, "every vector assigned exactly once")
    assert(a.select("vec_id").distinct().count() == n)
    val kUsed = a.select("cluster").distinct().count()
    assert(kUsed > 4, "auto-k above flatMaxK must produce more clusters than the flat cap")
    // expected cluster size stays ≈ target (the candidates-∝-n property):
    // mean size within 4× of target in both directions
    val meanSz = n.toDouble / kUsed
    assert(meanSz < 4.0 * target && meanSz > target / 4.0, s"mean cluster size $meanSz")
    val sims = a.agg(min("sim"), max("sim")).head()
    assert(sims.getDouble(0) >= -1.0 - 1e-9 && sims.getDouble(1) <= 1.0 + 1e-9)
    // deterministic: a second run reproduces the assignment bit-for-bit
    val b = Clustering.kmeansAssignAuto(
      embs, targetClusterSize = target, minK = 10, iters = 2, flatMaxK = 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "two runs must agree exactly")
    // planted exact clones always co-cluster (identical vector → same
    // argmax under the deterministic tie-break) — SemDeDup recall floor
    val clones = embs
      .filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"), col("nrm"))
    val withClones = embs.unionByName(clones).localCheckpoint()
    val ac = Clustering.kmeansAssignAuto(
      withClones, targetClusterSize = target, minK = 10, iters = 2, flatMaxK = 4)
    val pairs = ac
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("cluster").as("c1"))
      .join(
        ac.filter(col("vec_id") >= 1000000L)
          .select((col("vec_id") - 1000000L).as("vec_id"), col("cluster").as("c2")),
        "vec_id")
    assert(pairs.count() == 20)
    assert(pairs.filter(col("c1") =!= col("c2")).count() == 0, "clones must co-cluster")
  }

  test("forced three-level quantizer (+ shuffle fine join): total, deterministic, clones co-cluster, sizes ≈ target") {
    // flatMaxK = 4 forces the coarse split itself through a recursive
    // two-level call (k₁ = √k > 4), i.e. a three-level tree; a 1-byte
    // broadcast budget forces the fine join onto the shuffle_hash path —
    // together the exact routing a k ≈ 10⁶ corpus would take.
    val target = 10
    def run() = Clustering.kmeansAssignTwoLevel(
      embs, targetClusterSize = target, iters = 2,
      flatMaxK = 4, broadcastBudgetBytes = 1L)
    val a = run().localCheckpoint()
    val n = embs.count()
    assert(a.count() == n, "every vector assigned exactly once")
    assert(a.select("vec_id").distinct().count() == n)
    val kUsed = a.select("cluster").distinct().count()
    assert(kUsed > 16, "three-level auto-k must exceed the squared flat cap")
    val meanSz = n.toDouble / kUsed
    assert(meanSz < 4.0 * target && meanSz > target / 4.0, s"mean cluster size $meanSz")
    // deterministic: a second run reproduces the assignment bit-for-bit
    val b = run()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "two runs must agree exactly")
    // planted exact clones co-cluster through all three levels
    val clones = embs
      .filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"), col("nrm"))
    val withClones = embs.unionByName(clones).localCheckpoint()
    val ac = Clustering.kmeansAssignTwoLevel(
      withClones, targetClusterSize = target, iters = 2,
      flatMaxK = 4, broadcastBudgetBytes = 1L)
    val pairs = ac
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("cluster").as("c1"))
      .join(
        ac.filter(col("vec_id") >= 1000000L)
          .select((col("vec_id") - 1000000L).as("vec_id"), col("cluster").as("c2")),
        "vec_id")
    assert(pairs.count() == 20)
    assert(pairs.filter(col("c1") =!= col("c2")).count() == 0, "clones must co-cluster")
    // broadcast-budget routing alone (no forced depth) also stays exact:
    // shuffle fine join ≡ broadcast fine join result-for-result
    val viaShuffle = Clustering.kmeansAssignTwoLevel(
      embs, targetClusterSize = 50, iters = 1, broadcastBudgetBytes = 1L)
    val viaBroadcast = Clustering.kmeansAssignTwoLevel(
      embs, targetClusterSize = 50, iters = 1)
    assert(viaShuffle.exceptAll(viaBroadcast).isEmpty &&
      viaBroadcast.exceptAll(viaShuffle).isEmpty,
      "join strategy must not change the assignment")
  }

  test("two-level quantizer rejects an EMPTY input with the contract error, not an NPE") {
    // an empty corpus is rejected by kmeansAssign's require BEFORE the
    // jBits packing reads max(j)/max(cell) off the fine table — the
    // failure mode must stay the documented contract error, never a
    // driver NPE off the all-NULL aggregate row (which is additionally
    // null-guarded in the packing itself)
    val empty = embs.filter(col("vec_id") < 0).localCheckpoint()
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansAssignTwoLevel(empty, targetClusterSize = 10, iters = 1)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("Lloyd rounds monotonically improve the mean assigned cosine") {
    // the corpus vectors are unit-norm, so mean-update k-means is
    // spherical k-means: each assignment and each centroid step cannot
    // decrease the objective (up to the 1e-7 fixed-point quantization)
    val j0 = avgSim(0)
    val j1 = avgSim(1)
    val j2 = avgSim(2)
    assert(j1 >= j0 - 1e-6, s"iter 1 regressed: $j1 < $j0")
    assert(j2 >= j1 - 1e-6, s"iter 2 regressed: $j2 < $j1")
    assert(j1 > j0 + 1e-4, s"iter 1 should improve from the arbitrary init")
  }

  test("semanticPairs == all-pairs cosine baseline restricted to co-cluster pairs") {
    val assign = Clustering.kmeansAssign(embs, k = 10, iters = 2)
    val sem = Clustering
      .semanticPairs(embs, assign, threshold = 0.3)
      .select("a_id", "b_id", "cos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val cluster = assign
      .select(col("vec_id"), col("cluster"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val expected = Dedup
      .embeddingCosine(embs, threshold = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => cluster(a) == cluster(b) }
      .toSet
    assert(sem == expected)
    assert(sem.nonEmpty, "threshold 0.3 should catch at least one co-cluster pair")
  }

  test("duplicateSpans: exact-duplicate docs have dup_frac 1.0, bounds hold") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val spans = Dedup.duplicateSpans(docs, k = 3).localCheckpoint()
    val bad = spans
      .filter(
        col("n_dup") > col("n_shingles") || col("n_dup") < 0 ||
          col("dup_frac") < 0 || col("dup_frac") > 1)
      .count()
    assert(bad == 0)
    // a doc whose full text appears twice duplicates every one of its
    // spans — craft copies (the synthetic corpus has no exact dups)
    val withCopies = docs.union(
      docs.orderBy("doc_id").limit(5).withColumn("doc_id", col("doc_id") + 100000))
    val fracs = Dedup
      .duplicateSpans(withCopies, k = 3)
      .filter(col("doc_id") < 5 || col("doc_id") >= 100000)
      .select("dup_frac")
      .collect()
      .map(_.getDouble(0))
    assert(fracs.length == 10)
    assert(fracs.forall(_ == 1.0), s"expected 1.0 fracs, got ${fracs.toSeq}")
  }

  test("minhashLshAgainst == full-corpus minhashLsh restricted to cross-side pairs") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val batch = graft.operators.Sampling.sampleByHash(docs, "doc_id", 0.1)
    val corpus = graft.operators.Sampling.complement(docs, "doc_id", 0.1)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val incr = Dedup
      .minhashLshAgainst(batch, corpus, k = 3, numHashes = 16, bands = 8, threshold = 0.8)
      .select("new_id", "dup_of", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val full = Dedup
      .minhashLsh(docs, k = 3, numHashes = 16, bands = 8, threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        // orient cross-side pairs as (batch id, corpus id)
        if (batchIds(a) && !batchIds(b)) Some((a, b, j))
        else if (batchIds(b) && !batchIds(a)) Some((b, a, j))
        else None
      }
      .toSet
    assert(incr == full, s"diff: ${(incr diff full) ++ (full diff incr)}")
    assert(incr.nonEmpty, "the 10% batch should collide with the corpus")
  }
}
