package graft.model

/** Core data model of the graft streams engine.
  *
  * Mirrors the semantics of the reference event store's wire types
  * (reference: server/messages.go:38-78) re-expressed as Spark-encodable
  * case classes:
  *
  *  - a '''space''' is a top-level logical container of related streams,
  *  - a '''segment''' is an independent, strictly-ordered sub-stream,
  *  - an '''entry''' is one committed event with a per-segment contiguous
  *    `sequence` and a commit `timestamp` (µs since epoch).
  */
final case class Record(
    sequence: Long,
    payload: String,
    metadata: Map[String, String] = Map.empty)

final case class Entry(
    space: String,
    segment: String,
    sequence: Long,
    timestamp: Long, // µs since epoch
    trxNumber: Long,
    payload: String,
    metadata: Map[String, String] = Map.empty)

/** Per-chunk produce acknowledgement (reference: server/messages.go:38). */
final case class SegmentStatus(
    space: String,
    segment: String,
    firstSequence: Long,
    firstTimestamp: Long,
    lastSequence: Long,
    lastTimestamp: Long)

/** A position in a space's time-interleaved stream. Orders like the
  * reference's lexicographic space offset key `(timestamp, segment,
  * sequence)` (reference: server/messages.go:72-74). */
final case class SpaceOffset(timestamp: Long, segment: String, sequence: Long)

/** A position in a single segment (reference: server/messages.go:76-78). */
final case class SegmentOffset(sequence: Long)

/** Execution-cluster health (reference GetClusterStatus,
  * pebble/service.go:139 — active node count; on Spark the execution
  * nodes are the executors). */
final case class ClusterStatus(activeNodes: Int, defaultParallelism: Int)
