package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** The reference's own end-to-end test scenario, reproduced 1:1
  * (reference: test/streams_test.go): produce 5 spaces × 5 segments ×
  * 253 records, then assert the exact counts its suite asserts —
  * GetSpaces = 5 sorted, GetSegments = 5 sorted, Peek.sequence = 253,
  * ConsumeSegment = 253 rows, ConsumeSpace = 1265 rows,
  * Consume(5 spaces) = 6325 rows. */
class ReferenceMirrorSpec extends SparkSpec {

  import spark.implicits._

  // 5 spaces × 5 segments × 253 entries; timestamps interleave segments
  // within a space (entry i of every segment shares one tick, like the
  // reference's per-chunk timestamp stamping).
  private lazy val log = {
    val rows = for {
      s <- 0 until 5
      g <- 0 until 5
      i <- 1 to 253
    } yield (s"space-$s", s"seg-$g", i.toLong, 1000000L * i, s"payload-$s-$g-$i", i.toDouble)
    rows
      .toDF("space", "segment", "sequence", "timestamp", "payload", "value")
      .repartition(8)
      .cache()
  }

  test("GetSpaces returns the 5 spaces, sorted") {
    val spaces = EventOps.getSpaces(log).collect().map(_.getString(0))
    assert(spaces.toSeq == (0 until 5).map(s => s"space-$s"))
  }

  test("GetSegments returns the 5 segments of a space, sorted") {
    val segs = EventOps.getSegments(log, "space-2").collect().map(_.getString(0))
    assert(segs.toSeq == (0 until 5).map(g => s"seg-$g"))
  }

  test("Peek returns sequence 253 for every segment") {
    val peeked = EventOps.peek(log).collect()
    assert(peeked.length == 25)
    assert(peeked.forall(_.getAs[Long]("sequence") == 253L))
  }

  test("ConsumeSegment returns all 253 entries of one segment in order") {
    val rows = EventOps
      .consumeSegment(log, "space-1", "seg-3")
      .select("sequence")
      .collect()
      .map(_.getLong(0))
    assert(rows.length == 253)
    assert(rows.toSeq == (1L to 253L))
  }

  test("ConsumeSpace returns 1265 time-interleaved entries") {
    val rows = EventOps
      .consumeSpace(log, "space-0")
      .select("timestamp", "segment", "sequence")
      .collect()
    assert(rows.length == 5 * 253)
    val key = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(key.sameElements(key.sorted))
    // time-interleaved: all segments' entry i share tick i, so each
    // timestamp bucket holds one entry per segment
    assert(key.take(5).map(_._2).toSet.size == 5)
  }

  test("Consume over all 5 spaces returns 6325 entries") {
    val offsets = (0 until 5).map(s => s"space-$s" -> None).toMap
    val rows = EventOps.consume(log, offsets)
    assert(rows.count() == 5 * 5 * 253)
  }

  test("Consume honours a per-space exclusive offset like Synchronize") {
    // resume space-0 strictly after (tick 250, seg-2, 250): from seg-2's
    // view only 251..253 remain plus seg-3/4 at tick 250, etc.
    val rows = EventOps
      .consume(
        log,
        Map(
          "space-0" -> Some((250L * 1000000L, "seg-2", 250L)),
          "space-1" -> None))
      .filter(col("space") === "space-0")
      .select("timestamp", "segment", "sequence")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = (for {
      g <- 0 until 5
      i <- 1 to 253
    } yield (1000000L * i, s"seg-$g", i.toLong))
      .filter { case (ts, seg, seq) =>
        ts > 250000000L ||
        (ts == 250000000L && (seg > "seg-2" || (seg == "seg-2" && seq > 250)))
      }
      .sorted
    assert(rows.toSeq == expected)
  }
}
