package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over embedding columns — the
  * parameterized library surface behind the `q_ann_*` queries.
  *
  * Input contract: `queries` as `(query_id, q_v array<double>, q_nrm)`,
  * `corpus` as `(neighbor_id, c_v array<double>, c_nrm)` — pre-normed
  * (see [[withNorm]]). All variants return
  * `(query_id, rank, neighbor_id, cos)` with rank 1..k per query.
  *
  * Scale: the query side is broadcast (query sets are small by nature);
  * corpus cost is linear for [[lshTopK]]/[[ivfTopK]] (bucket equi-joins).
  * [[bruteForceTopK]] is the exact baseline — quadratic by construction.
  */
object Ann {

  /** Add a euclidean-norm column (computed once, reused by every pair). */
  def withNorm(embs: DataFrame, vec: String, nrm: String = "nrm"): DataFrame =
    embs.withColumn(nrm, VectorFns.norm(col(vec)))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  private def cos = round(
    VectorFns.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")),
    6)

  /** Exact cosine top-k: broadcast queries × full corpus. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 5): DataFrame =
    rankTopK(broadcast(queries).join(corpus).withColumn("cos", cos), k)

  /** Random-hyperplane LSH top-k: candidates restricted to the query's
    * sign-bucket. `nBits` hyperplanes of dimension `dim` are baked into
    * the plan as literals. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 5,
      nBits: Int = 4,
      dim: Int = 64): DataFrame = {
    val q = queries.withColumn(
      "bucket",
      VectorFns.hyperplaneSignature(col("q_v"), nBits, dim))
    val c = corpus.withColumn(
      "bucket",
      VectorFns.hyperplaneSignature(col("c_v"), nBits, dim))
    rankTopK(broadcast(q).join(c, "bucket").withColumn("cos", cos), k)
  }

  /** IVF top-k: a broadcast coarse quantizer of `centroids` rows
    * `(cent_id, cent_v, cent_nrm)`; every corpus vector is assigned to
    * its argmax-cosine centroid once (linear cost), queries probe their
    * `nProbe` nearest centroid lists. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      k: Int = 5,
      nProbe: Int = 2): DataFrame = {
    val cents = broadcast(centroids)

    def nearest(df: DataFrame, idCol: String, vCol: String, nrmCol: String, keep: Int) = {
      val w = Window.partitionBy(idCol).orderBy(col("cent_sim").desc, col("cent_id"))
      df.join(cents)
        .withColumn(
          "cent_sim",
          VectorFns.dot(col(vCol), col("cent_v")) / (col(nrmCol) * col("cent_nrm")))
        .withColumn("cent_rank", row_number().over(w))
        .filter(col("cent_rank") <= keep)
        .drop("cent_v", "cent_nrm", "cent_sim", "cent_rank")
    }

    val q = nearest(queries, "query_id", "q_v", "q_nrm", nProbe)
    val c = nearest(corpus, "neighbor_id", "c_v", "c_nrm", 1)
    rankTopK(broadcast(q).join(c, "cent_id").withColumn("cos", cos), k)
  }
}
