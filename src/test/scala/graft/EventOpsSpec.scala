package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.sources.Tables

/** Semantics of the streams-core operators on the sf0.001 events table —
  * the invariants the reference test-suite asserts (reference:
  * test/streams_test.go), restated over the driver's data. */
class EventOpsSpec extends SparkSpec {

  private lazy val log = EventOps.fromEvents(Tables.events(spark, SfDir)).cache()

  test("sequences are contiguous from 1 within every segment") {
    val bad = log
      .groupBy("space", "segment")
      .agg(
        min("sequence").as("lo"),
        max("sequence").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("clusterStatus reports at least one active node and the parallelism") {
    val cs = EventOps.clusterStatus(spark)
    assert(cs.activeNodes >= 1)
    assert(cs.defaultParallelism >= 1)
  }

  test("getSpaces returns sorted distinct spaces") {
    val spaces = EventOps.getSpaces(log).collect().map(_.getString(0))
    assert(spaces.sorted.sameElements(spaces))
    assert(spaces.toSet == Set("click", "error", "purchase", "signup", "view"))
  }

  test("peek returns the max-sequence entry per segment") {
    val peeked = EventOps.peek(log)
    val viaJoin = log
      .groupBy("space", "segment")
      .agg(max("sequence").as("sequence"))
      .join(log, Seq("space", "segment", "sequence"))
      .select("space", "segment", "sequence", "timestamp", "payload")
    assert(peeked.count() == viaJoin.count())
    assert(peeked.exceptAll(viaJoin).count() == 0)
  }

  test("consumeSegment bounds are min-exclusive / max-inclusive") {
    val seqs = EventOps
      .consumeSegment(log, "click", "7", minSequence = 3, maxSequence = 11)
      .select("sequence")
      .collect()
      .map(_.getLong(0))
    assert(seqs.head == 4 && seqs.last == 11)
    assert(seqs.sameElements(seqs.sorted))
  }

  test("consumeSpace interleaves segments in (timestamp, segment, sequence) order") {
    val rows = EventOps
      .consumeSpace(log, "view")
      .select("timestamp", "segment", "sequence")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sameElements(rows.sorted))
    assert(rows.length == log.filter(col("space") === "view").count())
  }

  test("consume from offsets resumes exclusively and covers all spaces") {
    val all = EventOps.consume(log, Map("view" -> None, "click" -> None))
    val expected = log.filter(col("space").isin("view", "click")).count()
    assert(all.count() == expected)

    // resuming from the space's last offset yields nothing
    val last = EventOps
      .spaceOffsets(log)
      .filter(col("space") === "view")
      .collect()
      .head
    val resumed = EventOps.consume(
      log,
      Map("view" -> Some((last.getLong(1), last.getString(2), last.getLong(3)))))
    assert(resumed.count() == 0)
  }

  test("trxChunks partitions each segment into contiguous chunks") {
    val chunks = EventOps.trxChunks(log, 5)
    val bad = chunks
      .filter(
        col("last_sequence") - col("first_sequence") + 1 > 5 ||
          col("first_sequence") =!= (col("trx_number") - 1) * 5 + 1)
      .count()
    assert(bad == 0)
  }

  test("sequenceViolations: row_number-derived sequences are violation-free") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type", "user_id")
      .orderBy("ts_us", "event_id")
    val withSeq = Tables
      .events(spark, SfDir)
      .withColumn("good_seq", row_number().over(w))
    val v = EventOps
      .sequenceViolations(withSeq, col("good_seq"))
      .agg(sum("violations"))
      .collect()
      .head
      .getLong(0)
    assert(v == 0)
  }
}
