package graft.log

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Entry, Record, SegmentStatus}
import graft.operators.EventOps

/** A parquet-backed spaces/segments event store with the reference's
  * produce/consume semantics (reference: server/pebble/service.go),
  * re-expressed on Spark:
  *
  *  - entries live in an append-only parquet table partitioned by `space`
  *    (partition pruning ≡ the reference's key-prefix scans; at cluster
  *    scale the same layout holds on object storage),
  *  - produce validates sequence contiguity *distributively* (an
  *    aggregate over the batch, not a per-record loop) and chunks the
  *    batch into fixed-size transactions exactly like the reference's
  *    10 000-entry produce chunks (pebble/service.go:307),
  *  - reads delegate to [[graft.operators.EventOps]] so consume plans are
  *    identical whether the log came from this store or any other source.
  *
  * Single-writer-per-segment is assumed (same as the reference, where the
  * segment leader serializes writes).
  */
final class EventLog(val spark: SparkSession, val path: String) {
  import spark.implicits._

  private val dataDir = s"$path/data"

  def isEmpty: Boolean = !Files.exists(Paths.get(dataDir))

  /** The committed log as a DataFrame in canonical schema. */
  def load(): DataFrame =
    if (isEmpty)
      spark.emptyDataset[Entry].toDF()
    else spark.read.parquet(dataDir)

  /** Append `records` to one segment. Sequences must continue the
    * segment's last committed sequence contiguously — the batch is
    * validated with one aggregate (min/max/count/distinct) instead of a
    * sequential scan, then stamped and chunked into transactions of
    * `chunkSize`. Returns one [[SegmentStatus]] per chunk, in order.
    * (reference: Produce, pebble/service.go:296-343) */
  def produce(
      space: String,
      segment: String,
      records: Dataset[Record],
      timestampUs: Long,
      chunkSize: Int = 10000): Seq[SegmentStatus] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val last = peek(space, segment)
    val lastSeq = last.map(_.sequence).getOrElse(0L)
    val lastTrx = last.map(_.trxNumber).getOrElse(0L)

    val stats = records
      .agg(
        count(lit(1)).as("n"),
        min("sequence").as("lo"),
        max("sequence").as("hi"),
        count_distinct(col("sequence")).as("nd"))
      .head()
    val (n, lo, hi, nd) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    if (n == 0) return Seq.empty
    require(
      lo == lastSeq + 1 && hi == lastSeq + n && nd == n,
      s"sequence mismatch: expected contiguous [${lastSeq + 1}, ${lastSeq + n}], " +
        s"got [$lo, $hi] with $nd distinct of $n")

    val entries = records
      .select(
        lit(space).as("space"),
        lit(segment).as("segment"),
        col("sequence"),
        lit(timestampUs).as("timestamp"),
        expr(s"CAST($lastTrx + 1 + (sequence - $lo) DIV $chunkSize AS BIGINT)")
          .as("trxNumber"),
        col("payload"),
        col("metadata"))
    entries.write
      .mode(SaveMode.Append)
      .partitionBy("space")
      .parquet(dataDir)

    // Per-chunk statuses from the batch plan itself — never from a log
    // readback: a produce must stay O(batch), not O(segment history).
    entries
      .groupBy("trxNumber")
      .agg(
        min("sequence").as("firstSequence"),
        min("timestamp").as("firstTimestamp"),
        max("sequence").as("lastSequence"),
        max("timestamp").as("lastTimestamp"))
      .orderBy("trxNumber")
      .select(
        lit(space).as("space"),
        lit(segment).as("segment"),
        col("firstSequence"),
        col("firstTimestamp"),
        col("lastSequence"),
        col("lastTimestamp"))
      .as[SegmentStatus]
      .collect()
      .toSeq
  }

  /** One-off append at peek+1 (reference: Publish, client.go:149). */
  def publish(
      space: String,
      segment: String,
      payload: String,
      timestampUs: Long,
      metadata: Map[String, String] = Map.empty): SegmentStatus = {
    val next = peek(space, segment).map(_.sequence).getOrElse(0L) + 1
    produce(
      space,
      segment,
      spark.createDataset(Seq(Record(next, payload, metadata))),
      timestampUs).head
  }

  /** Last entry of a segment (reference: Peek, pebble/service.go:224). */
  def peek(space: String, segment: String): Option[Entry] =
    if (isEmpty) None
    else
      load()
        .filter(col("space") === space && col("segment") === segment)
        .orderBy(col("sequence").desc)
        .limit(1)
        .as[Entry]
        .collect()
        .headOption

  def getSpaces(): DataFrame = EventOps.getSpaces(load())

  def getSegments(space: String): DataFrame =
    EventOps.getSegments(load(), space)

  def segmentStatus(): DataFrame = EventOps.segmentStatus(load())

  def consumeSegment(
      space: String,
      segment: String,
      minSequence: Long = 0L,
      maxSequence: Long = 0L,
      minTimestamp: Long = 0L,
      maxTimestamp: Long = 0L): DataFrame =
    EventOps.consumeSegment(
      load(), space, segment, minSequence, maxSequence, minTimestamp,
      maxTimestamp)

  def consumeSpace(
      space: String,
      minTimestamp: Long = 0L,
      maxTimestamp: Long = 0L): DataFrame =
    EventOps.consumeSpace(load(), space, minTimestamp, maxTimestamp)

  def consume(
      offsets: Map[String, Option[(Long, String, Long)]]): DataFrame =
    EventOps.consume(load(), offsets)

  def spaceOffsets(): DataFrame = EventOps.spaceOffsets(load())

  /** Compact one space's partition into ~`targetFileBytes` files. Every
    * produce/commit appends files, so a hot segment accumulates small
    * parquet files — the classic log-store compaction (the reference's
    * LSM store compacts in Pebble; a parquet log does it by rewrite).
    * Rewrites into a staging dir, then swaps atomically-per-file;
    * single-writer-per-segment is assumed, as everywhere else. Returns
    * the resulting file count (0 if the space does not exist). */
  def compact(space: String, targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val partPath = Paths.get(dataDir, s"space=$space")
    if (!Files.exists(partPath)) return 0
    val bytes = Files
      .walk(partPath)
      .filter(p => Files.isRegularFile(p))
      .mapToLong(p => Files.size(p))
      .sum()
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val staging = Paths.get(s"$path/compacting-$space")
    spark.read
      .parquet(partPath.toString)
      .repartition(nFiles)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(staging.toString)
    // swap: move compacted files in, then drop the replaced originals
    val originals = {
      val s = Files.list(partPath)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      } finally s.close()
    }
    val stagedFiles = {
      val s = Files.list(staging)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      } finally s.close()
    }
    stagedFiles.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, partPath.resolve(s"compacted-$i-${p.getFileName}"))
    }
    originals.foreach { p =>
      Files.delete(p)
      // drop the local-FS checksum sidecar too, or it lingers orphaned
      Files.deleteIfExists(p.getParent.resolve(s".${p.getFileName}.crc"))
    }
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    nFiles
  }

  /** Anti-entropy catch-up from a peer log (reference: Synchronize /
    * SynchronizeSpace / SynchronizeSegment, pebble/service.go:532):
    * append every entry the peer holds beyond this log's per-segment
    * high-water marks. Runs as one distributed plan — the peer's
    * entries join (broadcast) against this log's per-segment max
    * sequences; only the missing tail is written. Returns the number of
    * entries pulled. Idempotent: a second call pulls 0. */
  def synchronize(remote: EventLog, space: Option[String] = None, segment: Option[String] = None): Long = {
    var remoteDf = remote.load()
    space.foreach(sp => remoteDf = remoteDf.filter(col("space") === sp))
    segment.foreach(sg => remoteDf = remoteDf.filter(col("segment") === sg))
    if (remoteDf.isEmpty) return 0L

    val localHw =
      if (isEmpty) null
      else
        load()
          .groupBy(col("space").as("hw_space"), col("segment").as("hw_segment"))
          .agg(max("sequence").as("hw_seq"))
    val missing =
      if (localHw == null) remoteDf
      else
        remoteDf
          .join(
            broadcast(localHw),
            col("space") === col("hw_space") && col("segment") === col("hw_segment"),
            "left")
          .filter(col("hw_seq").isNull || col("sequence") > col("hw_seq"))
          .drop("hw_space", "hw_segment", "hw_seq")

    val toWrite = missing.cache()
    try {
      val n = toWrite.count()
      if (n > 0)
        toWrite.write
          .mode(SaveMode.Append)
          .partitionBy("space")
          .parquet(dataDir)
      n
    } finally toWrite.unpersist()
  }
}
