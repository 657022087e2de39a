package graft

import graft.functions.BpeTrainer

/** Hand-traced BPE training semantics (the merge-induction rules the
  * q_bpe_train oracle replays in SQL): weighted overlapping pair
  * statistics, (count DESC, pair ASC) tie-break, left-to-right
  * non-overlapping merge application, early stop on a fully-merged
  * vocabulary. */
class BpeTrainerSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hand-traced merges: weighted counts, tie-break, early stop") {
    // words: aaab ×2, ab ×3.
    // round 1: (a,a) 2·2=4 < (a,b) 2+3=5 → merge (a,b) count 5
    // round 2: aa(ab) ×2 → (a,a):2 ties (a,ab):2 → pair-ASC picks (a,a)
    // round 3: (aa)(ab) ×2 → merge (aa,ab) count 2; then no pairs left
    val got = BpeTrainer
      .train(corpus("aaab aaab ab", "ab ab"), merges = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got === Seq(
      (1, "a", "b", "ab", 5L),
      (2, "a", "a", "aa", 2L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("overlapping pairs count, non-overlapping apply (aaaa)") {
    // round 1: aaaa holds THREE (a,a) occurrences (Sennrich get_stats),
    // but the merge applies left-to-right non-overlapping → aa aa
    // round 2: exactly one (aa,aa) pair remains
    val got = BpeTrainer
      .train(corpus("aaaa"), merges = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(got === Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }

  test("randomized corpora: distributed trainer equals a naive in-memory reference") {
    // Naive Sennrich-style reference: weighted overlapping pair counts,
    // (count DESC, left ASC, right ASC) tie-break, left-to-right
    // non-overlapping merge application. ASCII-only corpora, where
    // byte/hex/string orders coincide, so plain string comparison
    // reproduces the trainer's hex-spelling tie-break.
    def naive(texts: Seq[String], merges: Int): Seq[(String, String, String, Long)] = {
      var words: Map[Vector[String], Long] = texts
        .flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity)
        .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
      val out = Seq.newBuilder[(String, String, String, Long)]
      var continue = true
      var r = 0
      while (r < merges && continue) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (syms, cnt) =>
          syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + cnt
          }
        }
        if (counts.isEmpty) continue = false
        else {
          val ((l, rt), c) = counts.toSeq.minBy { case ((l, rt), c) => (-c, l, rt) }
          out += ((l, rt, l + rt, c))
          words = words.groupMapReduce {
            case (syms, _) =>
              val b = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                  b += l + rt; i += 2
                } else { b += syms(i); i += 1 }
              }
              b.result()
          } { case (_, cnt) => cnt }(_ + _)
          r += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 6) {
      val vocab = Seq.fill(2 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(3)).toChar).mkString)
      val texts = Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val want = naive(texts, merges = 4)
      val got = BpeTrainer
        .train(corpus(texts: _*), merges = 4)
        .orderBy("rank")
        .collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
      assert(got == want, s"corpus=$texts")
    }
  }

  test("learned merges on the sf corpus are frequency-ordered and well-formed") {
    val rows = graft.queries.PipelineQueries.qBpeTrain(spark, SfDir).collect()
    assert(rows.nonEmpty)
    // ranks are 1..n dense; merged = left || right; each round's count
    // never exceeds the previous round's (the argmax shrinks or moves
    // mass, it can't create new adjacencies more frequent than the pair
    // it just consumed... except via the merged symbol itself — so only
    // assert the first round is the global max)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    rows.foreach { r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) >= 1L)
    }
    assert(rows.head.getLong(4) === rows.map(_.getLong(4)).max)
  }
}
