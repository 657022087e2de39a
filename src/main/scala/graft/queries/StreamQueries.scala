package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Streams-core queries (SURVEY §2a rows 1–11) + their DuckDB oracles.
  *
  * The canonical log view maps the driver's `events` table onto the
  * reference data model: space := event_type, segment := user_id,
  * sequence := per-segment row_number by (ts, event_id), timestamp :=
  * µs since epoch (integer, so Spark-µs vs DuckDB-ns precision can never
  * skew the comparison).
  */
object StreamQueries {

  /** 2024-01-10T00:00:00Z / 2024-01-20T00:00:00Z in µs. */
  private val T1 = 1704844800000000L
  private val T2 = 1705708800000000L

  private def log(s: SparkSession, dir: String): DataFrame =
    EventOps.fromEvents(graft.sources.Tables.events(s, dir))

  /** DuckDB twin of [[EventOps.fromEvents]]. */
  private val LogCte =
    """WITH log AS (
      |  SELECT event_type AS space,
      |         CAST(user_id AS VARCHAR) AS segment,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) AS BIGINT) AS sequence,
      |         epoch_us(ts) AS "timestamp",
      |         props AS payload,
      |         value
      |  FROM events
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_get_spaces" -> ((s, d) => EventOps.getSpaces(log(s, d))),
    "q_get_segments" -> ((s, d) => EventOps.getSegments(log(s, d), "click")),
    "q_peek" -> ((s, d) => EventOps.peek(log(s, d))),
    "q_segment_status" -> ((s, d) => EventOps.segmentStatus(log(s, d))),
    "q_consume_segment" -> ((s, d) =>
      EventOps.consumeSegment(log(s, d), "click", "7", minSequence = 3, maxSequence = 11)),
    "q_consume_space" -> ((s, d) =>
      EventOps.consumeSpace(log(s, d), "view", minTimestamp = T1, maxTimestamp = T2)),
    "q_consume_space_offset" -> ((s, d) =>
      EventOps.consumeSpaceFromOffset(log(s, d), "click", T1, "50", 3)),
    "q_consume_multi" -> ((s, d) =>
      EventOps.consume(
        log(s, d),
        Map(
          "click" -> Some((T1, "50", 3)),
          "view" -> None,
          "error" -> None))),
    "q_enumerate_space" -> ((s, d) =>
      EventOps.enumerateSpace(
        log(s, d),
        "view",
        offset = Some((T1, "50", 3)),
        maxTimestamp = T2)),
    "q_offsets" -> ((s, d) => EventOps.spaceOffsets(log(s, d))),
    "q_produce_validate" -> ((s, d) =>
      EventOps.sequenceViolations(
        graft.sources.Tables.events(s, d),
        col("event_id"))),
    "q_trx_chunks" -> ((s, d) => EventOps.trxChunks(log(s, d), 100))
  )

  private val offsetPredicate =
    s"""("timestamp" > $T1 OR ("timestamp" = $T1 AND (segment > '50' OR (segment = '50' AND sequence > 3))))"""

  val oracles: Map[String, String] = Map(
    "q_get_spaces" ->
      "SELECT DISTINCT event_type AS space FROM events ORDER BY space",
    "q_get_segments" ->
      "SELECT DISTINCT CAST(user_id AS VARCHAR) AS segment FROM events WHERE event_type = 'click' ORDER BY segment",
    "q_peek" ->
      s"""$LogCte
         |SELECT space, segment, max(sequence) AS sequence,
         |       arg_max("timestamp", sequence) AS "timestamp",
         |       arg_max(payload, sequence) AS payload
         |FROM log GROUP BY space, segment ORDER BY space, segment""".stripMargin,
    "q_segment_status" ->
      s"""$LogCte
         |SELECT space, segment,
         |       min(sequence) AS first_sequence, min("timestamp") AS first_timestamp,
         |       max(sequence) AS last_sequence, max("timestamp") AS last_timestamp
         |FROM log GROUP BY space, segment ORDER BY space, segment""".stripMargin,
    "q_consume_segment" ->
      s"""$LogCte
         |SELECT * FROM log
         |WHERE space = 'click' AND segment = '7' AND sequence > 3 AND sequence <= 11
         |ORDER BY sequence""".stripMargin,
    "q_consume_space" ->
      s"""$LogCte
         |SELECT * FROM log
         |WHERE space = 'view' AND "timestamp" > $T1 AND "timestamp" <= $T2
         |ORDER BY "timestamp", segment, sequence""".stripMargin,
    "q_consume_space_offset" ->
      s"""$LogCte
         |SELECT * FROM log
         |WHERE space = 'click' AND $offsetPredicate
         |ORDER BY "timestamp", segment, sequence""".stripMargin,
    "q_consume_multi" ->
      s"""$LogCte
         |SELECT * FROM log
         |WHERE (space = 'click' AND $offsetPredicate) OR space IN ('view', 'error')
         |ORDER BY "timestamp", space, segment, sequence""".stripMargin,
    "q_enumerate_space" ->
      s"""$LogCte
         |SELECT * FROM log
         |WHERE space = 'view' AND $offsetPredicate AND "timestamp" <= $T2
         |ORDER BY "timestamp", segment, sequence""".stripMargin,
    "q_offsets" ->
      s"""$LogCte
         |SELECT space, "timestamp", segment, sequence FROM log
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY space ORDER BY "timestamp" DESC, segment DESC, sequence DESC) = 1
         |ORDER BY space""".stripMargin,
    "q_produce_validate" ->
      """WITH seqd AS (
        |  SELECT event_type, user_id, event_id AS cand,
        |         LAG(event_id) OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT event_type AS space, CAST(user_id AS VARCHAR) AS segment,
        |       count(*) AS n_records,
        |       CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL AND cand != prev + 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
        |FROM seqd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_trx_chunks" ->
      s"""$LogCte
         |SELECT space, segment, CAST((sequence - 1) // 100 AS BIGINT) + 1 AS trx_number,
         |       min(sequence) AS first_sequence, min("timestamp") AS first_timestamp,
         |       max(sequence) AS last_sequence, max("timestamp") AS last_timestamp
         |FROM log GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  )
}
