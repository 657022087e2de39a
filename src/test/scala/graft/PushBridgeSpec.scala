package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.log.{EventLog, PushBridge}
import graft.model.{Record, SegmentStatus}

/** Cross-process push transport: produce acks cross the JVM boundary
  * through the filesystem mailbox (reference: broker/bus.go
  * Notify/Subscribe over wsstream/bidi_stream.go + http2/
  * http2_stream_bus.go; client.go:188 SubscribeToSpace). The consumer
  * side here is built on an INDEPENDENT Hadoop FileSystem handle from a
  * fresh Configuration — no shared in-memory state with the producing
  * EventLog beyond the directory, which is exactly what a second
  * process would hold. */
class PushBridgeSpec extends SparkSpec {

  private def freshLog(): EventLog =
    new EventLog(spark, Files.createTempDirectory("graft-push").toString)

  /** The "other process": its own FileSystem from a bare Configuration. */
  private def foreignFs(path: String): FileSystem =
    new Path(path).getFileSystem(new Configuration())

  private def records(from: Long, n: Long): org.apache.spark.sql.Dataset[Record] = {
    import spark.implicits._
    spark.createDataset((from until from + n).map(i => Record(i, s"payload $i")))
  }

  private def awaitUntil(timeoutMs: Long = 30000L)(done: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!done && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(done, s"condition not reached within ${timeoutMs}ms")
  }

  test("produce acks reach a foreign-FS subscriber in publish order, post-commit") {
    val log = freshLog()
    val pub = PushBridge.publisher(log)
    val got = mutable.Buffer.empty[SegmentStatus]
    val sub = PushBridge.subscriber(foreignFs(log.path), log.path) { st =>
      got.synchronized { got += st; () }
    }
    try {
      assert(sub.awaitReady())
      val statuses = log.produce("s0", "seg0", records(1, 250), 1000L, chunkSize = 100)
      assert(statuses.size == 3)
      awaitUntil()(got.synchronized(got.size) == 3)
      assert(got.synchronized(got.toSeq) == statuses,
        "mailbox must deliver the exact bus acks, in order")
      // post-commit: the acked range is already readable from the log
      assert(log.peek("s0", "seg0").get.sequence == 250L)
    } finally { sub.close(); pub.close() }
  }

  test("segment filter routes; names needing encoding survive the wire") {
    val log = freshLog()
    val pub = PushBridge.publisher(log)
    val seg = mutable.Buffer.empty[SegmentStatus]
    val all = mutable.Buffer.empty[SegmentStatus]
    val subSeg = PushBridge.subscriber(
      foreignFs(log.path), log.path, Some("sp a/ce"), Some("seg#1")) { st =>
      seg.synchronized { seg += st; () }
    }
    val subAll = PushBridge.subscriber(foreignFs(log.path), log.path) { st =>
      all.synchronized { all += st; () }
    }
    try {
      assert(subSeg.awaitReady() && subAll.awaitReady())
      log.produce("sp a/ce", "seg#1", records(1, 5), 1000L)
      log.produce("other", "segX", records(1, 5), 1000L)
      awaitUntil()(all.synchronized(all.size) == 2)
      awaitUntil()(seg.synchronized(seg.size) == 1)
      val st = seg.synchronized(seg.head)
      assert(st.space == "sp a/ce" && st.segment == "seg#1")
      assert(st.firstSequence == 1L && st.lastSequence == 5L)
      assert(all.synchronized(all.map(_.segment).toSeq) == Seq("seg#1", "segX"))
    } finally { subSeg.close(); subAll.close(); pub.close() }
  }

  test("live-only contract: acks published before subscribe are not replayed") {
    val log = freshLog()
    val pub = PushBridge.publisher(log)
    try {
      log.produce("s0", "seg0", records(1, 5), 1000L)
      awaitUntil()(pub.filesWritten >= 1) // the early ack is on disk
      val got = mutable.Buffer.empty[SegmentStatus]
      val sub = PushBridge.subscriber(foreignFs(log.path), log.path) { st =>
        got.synchronized { got += st; () }
      }
      try {
        assert(sub.awaitReady())
        log.produce("s0", "seg0", records(6, 5), 2000L)
        awaitUntil()(got.synchronized(got.size) == 1)
        assert(got.synchronized(got.head).firstSequence == 6L,
          "only the post-subscribe ack may be delivered")
      } finally sub.close()
    } finally pub.close()
  }

  test("publisher close flushes queued acks; expired mailbox files are pruned") {
    val log = freshLog()
    val notify = s"${log.path}/notify"
    def ackFiles(): Set[String] = {
      val fs = foreignFs(log.path)
      if (!graft.log.LogFs.exists(fs, notify)) Set.empty
      else
        fs.listStatus(new Path(notify))
          .collect {
            case s if s.isFile && s.getPath.getName.endsWith(".statuses") =>
              s.getPath.getName
          }
          .toSet
    }
    // long-ttl publisher: close() must flush every queued ack to disk
    val pub = PushBridge.publisher(log)
    val statuses = log.produce("s0", "seg0", records(1, 100), 1000L, chunkSize = 10)
    assert(statuses.size == 10)
    pub.close()
    assert(pub.filesWritten == 10, "close must drain the full queue")
    val old = ackFiles()
    assert(old.nonEmpty)
    // short-ttl publisher: its sweep removes the expired files above
    val pub2 = PushBridge.publisher(log, ttlMs = 1L)
    try {
      Thread.sleep(5) // put `old` past the 1ms ttl
      log.produce("s0", "seg0", records(101, 1), 2000L)
      awaitUntil()(ackFiles().intersect(old).isEmpty)
    } finally pub2.close()
    // pruning never breaks a live subscriber: it joins after the sweep
    // and still receives the next ack
    val got = mutable.Buffer.empty[SegmentStatus]
    val sub = PushBridge.subscriber(foreignFs(log.path), log.path) { st =>
      got.synchronized { got += st; () }
    }
    val pub3 = PushBridge.publisher(log)
    try {
      assert(sub.awaitReady())
      log.produce("s0", "seg0", records(102, 1), 3000L)
      awaitUntil()(got.synchronized(got.exists(_.firstSequence == 102L)))
    } finally { sub.close(); pub3.close() }
  }
}
