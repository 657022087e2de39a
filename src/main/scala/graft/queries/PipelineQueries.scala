package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns, VectorFns}
import graft.functions.expressions.{DotProduct, Tokens, WordShingles}

/** Training-data pipeline operators (SURVEY §2c): dedup, similarity
  * search, text analysis — each with a DuckDB oracle built on the shared
  * md5-derived hash family so results match bit-for-bit.
  *
  * Scale notes: near-dup candidate generation is always bounded (shingle
  * buckets / LSH bands / simhash tables), never all-pairs — the all-pairs
  * joins below appear only inside oracle-sized verification steps and the
  * brute-force ANN baseline.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic total order for small (post-filter) outputs: one
    * shuffle into a single partition + local sort. A global `orderBy`
    * would range-sample first, re-executing the whole upstream plan a
    * second time — wasteful when the result is a handful of pairs.
    * Full-table outputs keep the scalable range sort instead. */
  private def sortSmall(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** (doc_id, s: array<string>) distinct word 3-shingles, docs with ≥3
    * tokens (⟺ ≥1 shingle). Uses the codegen'd [[WordShingles]]
    * expression — the HOF formulation was the measured hot spot. */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    WordShingles.register(s)
    docs(s, dir)
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("s"))
      .filter(size(col("s")) > 0)
  }

  /** Exploded (doc_id, sz, shingle). */
  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    shingled(s, dir)
      .select(col("doc_id"), size(col("s")).cast("long").as("sz"), explode(col("s")).as("shingle"))

  private val ShingleCte =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM toks WHERE len(t) >= 3),
      |ex AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS sz, unnest(s) AS shingle FROM sh)""".stripMargin

  // ---------------------------------------------------------------- dedup

  def qDedupExact(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("h")

  /** Pairwise Jaccard on word 3-shingles over shingle-bucket candidates.
    * The bucket join runs on the 60-bit shingle hash, not the shingle
    * string — an 8-byte shuffle key instead of a ~40-byte one (the oracle
    * joins on the identical hash, so any collision affects both engines
    * the same way). */
  def qDedupNgram(s: SparkSession, d: String): DataFrame = {
    val ex = shingleRows(s, d)
      .select(col("doc_id"), col("sz"), Hashing.md5Long(col("shingle")).as("h"))
    val a = ex.select(
      col("doc_id").as("a_id"), col("sz").as("a_sz"), col("h"))
    val b = ex.select(
      col("doc_id").as("b_id"), col("sz").as("b_sz"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("common"))
      .withColumn(
        "jaccard",
        round(
          col("common").cast("double") /
            (col("a_sz") + col("b_sz") - col("common")),
          6))
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id", "jaccard")
      .transform(sortSmall(_, "a_id", "b_id"))
  }

  val MinhashSeeds = 16
  val MinhashBands = 8 // 2 rows per band

  /** MinHash signature columns mh0..mh15 per doc.
    *
    * One md5 digest per shingle row; the 16-member family is derived
    * arithmetically as `h_i = a + i·b` (a: 60-bit, b: 40-bit slices of
    * the digest — sum stays < 2^61, safe in both engines). The whole
    * signature is then a single map-side-partial `min` aggregation: one
    * shuffle of one row per doc, no distinct, no join. */
  private def minhashed(s: SparkSession, dir: String): DataFrame = {
    val ex = shingleRows(s, dir).select(
      col("doc_id"),
      Hashing.md5Long(col("shingle")).as("a"),
      Hashing.md5Long2(col("shingle")).as("b"))
    val mins = (0 until MinhashSeeds).map(i =>
      min(col("a") + lit(i.toLong) * col("b")).as(s"mh$i"))
    ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup: band buckets generate candidates; exact
    * Jaccard verifies. The bucket join is the 100 TB path — candidates
    * are bounded by band collisions, never all-pairs. */
  def qDedupMinhash(s: SparkSession, d: String): DataFrame = {
    val bands = (0 until MinhashBands).map { j =>
      struct(
        lit(j).as("band_id"),
        Hashing
          .md5Long(
            concat(
              col(s"mh${2 * j}").cast("string"),
              lit(":"),
              col(s"mh${2 * j + 1}").cast("string")))
          .as("band_hash"))
    }
    val banded = minhashed(s, d)
      .select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
    val cands = banded
      .as("x")
      .join(
        banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sh = shingled(s, d)
    cands
      .join(sh.select(col("doc_id").as("a_id"), col("s").as("a_s")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("s").as("b_s")), "b_id")
      .withColumn("common", size(array_intersect(col("a_s"), col("b_s"))).cast("long"))
      .withColumn(
        "jaccard",
        round(
          col("common").cast("double") /
            (size(col("a_s")) + size(col("b_s")) - col("common")),
          6))
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id", "jaccard")
      .transform(sortSmall(_, "a_id", "b_id"))
  }

  val SimhashBits = 60 // md5Long is a 60-bit hash
  val SimhashMaxHamming = 6

  /** 60-bit SimHash per doc over whitespace tokens (with multiplicity).
    *
    * One aggregation with 60 bit-count columns instead of exploding every
    * token 60× (which shuffles 60× the token count): per bit j,
    * `w_j = 2·ones_j − n`, so `w_j > 0 ⟺ 2·ones_j > n` — identical sign,
    * map-side partial aggregation, single shuffle of one row per doc. */
  private def simhashed(s: SparkSession, dir: String): DataFrame = {
    val ones = (0 until SimhashBits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"o$j"))
    val aggs = count(lit(1)).as("n") +: ones
    val simhash = (0 until SimhashBits)
      .map(j => when(col(s"o$j") * 2 > col("n"), lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    Tokens.register(s)
    docs(s, dir)
      .select(col("doc_id"), explode(expr("graft_tokens(text)")).as("tok"))
      .withColumn("h", Hashing.md5Long(col("tok")))
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
  }

  /** Candidate generation via 7 disjoint bit-bands: any pair with
    * hamming ≤ 6 agrees on at least one of 7 bands (pigeonhole), so the
    * band equi-join is *exact* — same output as the all-pairs comparison
    * the oracle runs, but a hash join on band values instead of an O(n²)
    * nested-loop join. */
  def qDedupSimhash(s: SparkSession, d: String): DataFrame = {
    val sh = simhashed(s, d)
    // 4×9-bit + 3×8-bit disjoint bands covering all 60 bits.
    val bandOffsets = Seq((0, 9), (9, 9), (18, 9), (27, 9), (36, 8), (44, 8), (52, 8))
    val bands = bandOffsets.zipWithIndex.map { case ((off, len), id) =>
      struct(
        lit(id).as("band_id"),
        shiftright(col("simhash"), off)
          .bitwiseAND(lit((1L << len) - 1))
          .as("band_bits"))
    }
    val banded = sh
      .select(col("doc_id"), col("simhash"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_id"), col("b.band_bits"))
    banded
      .as("x")
      .join(
        banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"),
        col("x.simhash").as("a_sim"),
        col("y.doc_id").as("b_id"),
        col("y.simhash").as("b_sim"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(a_sim ^ b_sim) AS BIGINT)"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .select("a_id", "b_id", "hamming")
      .transform(sortSmall(_, "a_id", "b_id"))
  }

  /** Embeddings with per-vector norm precomputed once (the norm inside
    * the pair loop would otherwise be recomputed N times per vector).
    * Uses the codegen'd [[DotProduct]] expression — same sequential fold
    * as the oracle's list_dot_product, so bit-identical cosines. */
  private def normedEmbs(s: SparkSession, dir: String): DataFrame =
    embs(s, dir)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFns.norm(col("v")))

  def qDedupEmbed(s: SparkSession, d: String): DataFrame = {
    val e = normedEmbs(s, d)
    e.select(col("vec_id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_nrm"))
      .join(
        e.select(col("vec_id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_nrm")),
        col("a_id") < col("b_id"))
      .withColumn(
        "cos",
        round(VectorFns.dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm")), 6))
      .filter(col("cos") >= 0.45)
      .select("a_id", "b_id", "cos")
      .transform(sortSmall(_, "a_id", "b_id"))
  }

  // ----------------------------------------------------------- similarity

  /** Brute-force cosine top-k: first 10 vectors are the query set, the
    * rest the corpus. Query side broadcast; rank via per-query window. */
  def qAnnTopk(s: SparkSession, d: String): DataFrame = {
    val e = normedEmbs(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val w = Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q)
      .join(c)
      .withColumn(
        "cos",
        round(VectorFns.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .transform(sortSmall(_, "query_id", "rank"))
  }

  /** LSH-bucketed ANN (the 100 TB scale path): random-hyperplane signature
    * buckets, search within the query's bucket only. Approximate → no SQL
    * oracle (rows-only check). */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val nBits = 4
    val e = normedEmbs(s, d)
      .withColumn("bucket", VectorFns.hyperplaneSignature(col("v"), nBits))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("q_v"), col("nrm").as("q_nrm"), col("bucket"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("neighbor_id"), col("v").as("c_v"), col("nrm").as("c_nrm"), col("bucket"))
    val w = Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q)
      .join(c, "bucket")
      .withColumn(
        "cos",
        round(VectorFns.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .transform(sortSmall(_, "query_id", "rank"))
  }

  /** IVF ANN (the other 100 TB scale path): a broadcast coarse quantizer
    * of `IvfCentroids` deterministic centroids (the first corpus
    * vectors); every corpus vector is assigned to its argmax-cosine
    * centroid once, queries probe their `IvfProbes` nearest centroid
    * lists. Corpus cost is linear (corpus × K broadcast, no pair
    * blowup); at cluster scale the assignment is the partitioning key.
    * Approximate → no SQL oracle (rows-only check). */
  val IvfCentroids = 8
  val IvfProbes = 2

  def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = normedEmbs(s, d)
    val cents = broadcast(
      e.filter(col("vec_id") >= 10 && col("vec_id") < lit(10 + IvfCentroids))
        .select(col("vec_id").as("cent_id"), col("v").as("cent_v"), col("nrm").as("cent_nrm")))

    def nearestCentroids(df: DataFrame, idCol: String, vCol: String, nrmCol: String, keep: Int) = {
      val w = Window.partitionBy(idCol).orderBy(col("cent_sim").desc, col("cent_id"))
      df.join(cents)
        .withColumn(
          "cent_sim",
          VectorFns.dot(col(vCol), col("cent_v")) / (col(nrmCol) * col("cent_nrm")))
        .withColumn("cent_rank", row_number().over(w))
        .filter(col("cent_rank") <= keep)
        .drop("cent_v", "cent_nrm", "cent_sim", "cent_rank")
    }

    val q = nearestCentroids(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("q_v"), col("nrm").as("q_nrm")),
      "query_id", "q_v", "q_nrm", IvfProbes)
    val c = nearestCentroids(
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), col("v").as("c_v"), col("nrm").as("c_nrm")),
      "neighbor_id", "c_v", "c_nrm", 1)

    val w = Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q)
      .join(c, "cent_id")
      .withColumn(
        "cos",
        round(VectorFns.dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .transform(sortSmall(_, "query_id", "rank"))
  }

  // ------------------------------------------------------------- text ops

  /** Tokens are projected once through the codegen'd [[Tokens]]
    * expression; the marker counts are then materialized in their own
    * projection so the language CASE doesn't re-evaluate each filter. */
  def qLangId(s: SparkSession, d: String): DataFrame = {
    Tokens.register(s)
    docs(s, d)
      .select(col("doc_id"), col("text"), expr("graft_tokens(text)").as("t"))
      .select(
        col("doc_id"),
        col("text"),
        TextFns.markerCount(col("t"), TextFns.EnMarkers).as("en"),
        TextFns.markerCount(col("t"), TextFns.DeMarkers).as("de"),
        TextFns.markerCount(col("t"), TextFns.FrMarkers).as("fr"),
        TextFns.markerCount(col("t"), TextFns.EsMarkers).as("es"))
      .select(
        col("doc_id"),
        when(regexp_count(col("text"), lit(TextFns.CjkPattern)) > 0, lit("zh"))
          .when(greatest(col("en"), col("de"), col("fr"), col("es")) === 0, lit("und"))
          .when(col("en") === greatest(col("en"), col("de"), col("fr"), col("es")), lit("en"))
          .when(col("de") === greatest(col("en"), col("de"), col("fr"), col("es")), lit("de"))
          .when(col("fr") === greatest(col("en"), col("de"), col("fr"), col("es")), lit("fr"))
          .otherwise(lit("es"))
          .as("pred_lang"))
      .orderBy("doc_id")
  }

  def qTextQuality(s: SparkSession, d: String): DataFrame = {
    Tokens.register(s)
    docs(s, d)
      .select(col("doc_id"), col("text"), expr("graft_tokens(text)").as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        round(TextFns.meanTokenLenFrom(col("t")), 4).as("mean_token_len"),
        round(TextFns.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextFns.stopwordRatioFrom(col("t")), 6).as("stopword_ratio"),
        round(TextFns.distinctTokenRatioFrom(col("t")), 6).as("distinct_ratio"))
      .withColumn(
        "quality_ok",
        col("n_tokens") >= 10 && col("n_tokens") <= 1000 &&
          col("punct_ratio") < 0.1 && col("distinct_ratio") > 0.3)
      .orderBy("doc_id")
  }

  def qTokenCount(s: SparkSession, d: String): DataFrame = {
    Tokens.register(s)
    docs(s, d)
      .select(
        col("doc_id"),
        size(expr("graft_tokens(text)")).cast("long").as("ws_tokens"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Shingle-hash document fingerprint: min-hash + xor-fold (order
    * independent, so engine-portable). Explode+aggregate rather than
    * array HOFs: min/bit_xor get map-side partials and stay codegen'd. */
  def qFingerprint(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d)
      .withColumn("h", Hashing.md5Long(col("shingle")))
      .groupBy("doc_id")
      .agg(
        min("h").as("fp_min"),
        expr("bit_xor(h)").as("fp_xor"),
        count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> qDedupExact _,
    "q_dedup_ngram" -> qDedupNgram _,
    "q_dedup_minhash" -> qDedupMinhash _,
    "q_dedup_simhash" -> qDedupSimhash _,
    "q_dedup_embed" -> qDedupEmbed _,
    "q_ann_topk" -> qAnnTopk _,
    "q_ann_lsh" -> qAnnLsh _,
    "q_ann_ivf" -> qAnnIvf _,
    "q_lang_id" -> qLangId _,
    "q_text_quality" -> qTextQuality _,
    "q_token_count" -> qTokenCount _,
    "q_fingerprint" -> qFingerprint _
  )

  private val minhashCte = {
    val a = Hashing.duckMd5Long("shingle")
    val b = Hashing.duckMd5Long2("shingle")
    val perSeed = (0 until MinhashSeeds)
      .map(i => s"min(a + $i * b) AS mh$i")
      .mkString(", ")
    s"""mhx AS (SELECT doc_id, $a AS a, $b AS b FROM ex),
       |mh AS (SELECT doc_id, $perSeed FROM mhx GROUP BY doc_id)""".stripMargin
  }

  private val bandCte = {
    val bands = (0 until MinhashBands)
      .map { j =>
        val h = Hashing.duckMd5Long(
          s"CAST(mh${2 * j} AS VARCHAR) || ':' || CAST(mh${2 * j + 1} AS VARCHAR)")
        s"SELECT doc_id, $j AS band_id, $h AS band_hash FROM mh"
      }
      .mkString(" UNION ALL ")
    s"""bands AS ($bands)"""
  }

  private val enL = TextFns.EnMarkers.map(m => s"'$m'").mkString(", ")
  private val deL = TextFns.DeMarkers.map(m => s"'$m'").mkString(", ")
  private val frL = TextFns.FrMarkers.map(m => s"'$m'").mkString(", ")
  private val esL = TextFns.EsMarkers.map(m => s"'$m'").mkString(", ")
  private val allL = (TextFns.EnMarkers ++ TextFns.DeMarkers ++
    TextFns.FrMarkers ++ TextFns.EsMarkers).map(m => s"'$m'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "q_dedup_ngram" ->
      s"""$ShingleCte,
         |ngx AS (SELECT doc_id, sz, ${Hashing.duckMd5Long("shingle")} AS h FROM ex),
         |common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_sz, b.sz AS b_sz, count(*) AS c
         |  FROM ngx a JOIN ngx b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT a_id, b_id, round(CAST(c AS DOUBLE) / (a_sz + b_sz - c), 6) AS jaccard
         |FROM common
         |WHERE round(CAST(c AS DOUBLE) / (a_sz + b_sz - c), 6) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_minhash" ->
      s"""$ShingleCte,
         |$minhashCte,
         |$bandCte,
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |common AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS a_sz, b.sz AS b_sz, count(*) AS c
         |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT cand.a_id, cand.b_id,
         |       round(CAST(c AS DOUBLE) / (a_sz + b_sz - c), 6) AS jaccard
         |FROM cand JOIN common ON cand.a_id = common.a_id AND cand.b_id = common.b_id
         |WHERE round(CAST(c AS DOUBLE) / (a_sz + b_sz - c), 6) >= 0.8
         |ORDER BY cand.a_id, cand.b_id""".stripMargin,
    "q_dedup_simhash" -> {
      val h = Hashing.duckMd5Long("tok")
      s"""WITH toksx AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS tok
         |  FROM documents),
         |hx AS (SELECT doc_id, $h AS h FROM toksx),
         |bits AS (
         |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS w
         |  FROM hx CROSS JOIN (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS j)
         |  GROUP BY doc_id, j),
         |sims AS (
         |  SELECT doc_id, CAST(SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming
         |ORDER BY a_id, b_id""".stripMargin
    },
    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, cos FROM pairs WHERE cos >= 0.45 ORDER BY a_id, b_id""".stripMargin,
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10)
        |SELECT query_id,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
        |       neighbor_id, cos
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, text,
         |         len(list_filter(toks, x -> list_contains([$enL], x))) AS en,
         |         len(list_filter(toks, x -> list_contains([$deL], x))) AS de,
         |         len(list_filter(toks, x -> list_contains([$frL], x))) AS fr,
         |         len(list_filter(toks, x -> list_contains([$esL], x))) AS es
         |  FROM t)
         |SELECT doc_id,
         |       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |            WHEN greatest(en, de, fr, es) = 0 THEN 'und'
         |            WHEN en = greatest(en, de, fr, es) THEN 'en'
         |            WHEN de = greatest(en, de, fr, es) THEN 'de'
         |            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
         |            ELSE 'es' END AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_tokens,
         |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END, 4) AS mean_token_len,
         |         round(CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / len(text) END, 6) AS punct_ratio,
         |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, x -> list_contains([$allL], x))) AS DOUBLE) / len(toks) END, 6) AS stopword_ratio,
         |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END, 6) AS distinct_ratio
         |  FROM t)
         |SELECT *, (n_tokens >= 10 AND n_tokens <= 1000 AND punct_ratio < 0.1 AND distinct_ratio > 0.3) AS quality_ok
         |FROM m ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      s"""SELECT doc_id,
         |       CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '${TextFns.BpePattern}')) AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fingerprint" -> {
      val h = Hashing.duckMd5Long("shingle")
      s"""$ShingleCte,
         |hx AS (SELECT doc_id, $h AS h FROM ex)
         |SELECT doc_id, min(h) AS fp_min,
         |       CAST(bit_xor(h) AS BIGINT) AS fp_xor,
         |       count(*) AS n_shingles
         |FROM hx GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }
  )
}
