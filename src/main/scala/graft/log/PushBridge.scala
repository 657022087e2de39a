package graft.log

import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.model.SegmentStatus

/** Cross-process push transport for [[SegmentStatus]] acks — the wire
  * half of the reference's delivery story. The reference fans produce
  * acks from its in-process broker onto per-connection bidi streams so
  * subscribers in OTHER processes get a push the moment a write commits
  * (reference: broker/bus.go:28 NotificationBus.Notify/Subscribe,
  * wsstream/bidi_stream.go:1, http2/http2_stream_bus.go:1,
  * client.go:188 SubscribeToSpace). A Spark library has no resident
  * server to hold sockets open, so the transport is re-expressed over
  * the one medium every participant already shares — the log's
  * filesystem: a producer-side [[PushPublisher]] drains the in-process
  * [[NotificationBus]] into an append-only ack mailbox under
  * `<log>/notify/`, and a consumer-side [[PushSubscriber]] in any other
  * JVM watches that directory (a real `java.nio` WatchService push on
  * local filesystems — no polling in the hot path; bounded-interval
  * scans on HDFS-like filesystems that cannot push) and fires callbacks
  * in commit order.
  *
  * Delivery contract (mirrors [[NotificationBus]] one level up):
  *  - '''per-publisher FIFO''': mailbox files sort by (µs timestamp,
  *    sequence) and each file holds one drained batch in publish order.
  *  - '''live feed, at-most-once per subscriber''': a subscriber joins
  *    at the current end of the mailbox and never replays history; a
  *    crashed subscriber re-reads nothing (resume-from-offset readers
  *    belong to `StreamLog.follow` / `ConsumerContext`, exactly as the
  *    reference routes replay through Consume, not the ack bus).
  *  - '''post-commit''': the bus publishes after the write is durably
  *    visible, and the mailbox file is staged + renamed, so a
  *    subscriber never observes a torn ack for an invisible write.
  *  - '''torn-copy safe''': on object stores whose rename is
  *    copy+delete (S3A — see [[LogFs]]'s atomicity caveat) a file can
  *    be LISTED while its content is mid-copy. Every mailbox file ends
  *    with a line-count sentinel; the subscriber processes a file only
  *    once the sentinel matches and retries incomplete files on the
  *    next tick instead of skipping past them — an ack is delayed by a
  *    copy, never lost to one. (On atomic-rename filesystems the
  *    sentinel is always already present, and per-publisher FIFO holds
  *    exactly; under torn copies delivery follows completed-visibility
  *    order.)
  *  - mailbox files are pruned by the publisher after `ttlMs` — the
  *    feed is a signal, not a store.
  */
object PushBridge {

  private[log] val NotifyDir = "notify"
  private val Suffix = ".statuses"

  /** Attach a mailbox publisher to `log`'s bus: every ack the bus fans
    * out is also appended to `<log>/notify/` for cross-process
    * subscribers. Close the returned handle to detach + flush. */
  def publisher(log: EventLog, ttlMs: Long = 15 * 60 * 1000L): PushPublisher = {
    val pub = new PushPublisher(log.hfs, s"${log.path}/$NotifyDir", ttlMs)
    pub.attach(log.bus)
    pub
  }

  /** Subscribe to the ack mailbox of the log at `logPath` from THIS
    * process, with its own FileSystem handle (no shared state with the
    * producing JVM beyond the directory). `space`/`segment` filter like
    * the bus's subscribeToSpace/subscribeToSegment; both-None is the
    * firehose. */
  def subscriber(
      fs: FileSystem,
      logPath: String,
      space: Option[String] = None,
      segment: Option[String] = None,
      pollMs: Long = 1000L)(cb: SegmentStatus => Unit): PushSubscriber =
    new PushSubscriber(fs, s"$logPath/$NotifyDir", space, segment, pollMs, cb)

  /** One ack per line; space/segment URL-encoded so any segment name
    * (tabs, newlines, slashes) survives the text round trip. */
  private[graft] def encode(st: SegmentStatus): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    s"${enc(st.space)}\t${enc(st.segment)}\t${st.firstSequence}\t${st.firstTimestamp}\t${st.lastSequence}\t${st.lastTimestamp}"
  }

  private[graft] def decode(line: String): Option[SegmentStatus] =
    line.split('\t') match {
      case Array(sp, seg, fs, ft, ls, lt) =>
        try {
          def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
          Some(SegmentStatus(dec(sp), dec(seg), fs.toLong, ft.toLong, ls.toLong, lt.toLong))
        } catch { case NonFatal(_) => None }
      case _ => None
    }

  private[log] def isAckFile(name: String): Boolean = name.endsWith(Suffix)

  /** Completeness sentinel: the final line of every mailbox file is
    * `#<n>` with n = the number of ack lines above it. Encoded ack
    * lines can never start with '#' (URLEncoder escapes it to %23), so
    * the sentinel is unambiguous. */
  private[log] def sentinel(n: Int): String = s"#$n"

  private[log] def isComplete(lines: List[String]): Boolean =
    lines.nonEmpty && lines.last == sentinel(lines.size - 1)

  /** Sortable (time, seq) prefix = per-publisher FIFO; pid + a
    * per-publisher nonce make names collision-free across processes
    * AND across publishers within one JVM. */
  private[log] def ackFileName(epochMicros: Long, seq: Long, nonce: String): String =
    f"$epochMicros%020d-$seq%06d-${ProcessHandle.current().pid()}%d-$nonce$Suffix"
}

/** Producer side: drains bus acks into the mailbox on a daemon thread,
  * one file per drained batch (a produce that acks 100 chunks costs ~1
  * mailbox file, and the bus callback itself is a queue offer — produce
  * latency is untouched). Prunes expired mailbox files as it goes. */
final class PushPublisher private[log] (
    fs: FileSystem,
    dir: String,
    ttlMs: Long)
    extends AutoCloseable {

  private val queue = new LinkedBlockingQueue[SegmentStatus]()
  private val open = new AtomicBoolean(true)
  private val seq = new AtomicLong(0L)
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private val written = new AtomicLong(0L)
  private val droppedBatches = new AtomicLong(0L)
  // high-water mark for the name's µs prefix: wall clock can step
  // BACKWARDS (NTP), and the name sorts by (time, seq) globally, so a
  // backwards step would reorder one publisher's files and break the
  // documented per-publisher FIFO. Names are stamped max(now, last+1) —
  // monotonic per publisher, tracking wall time whenever it moves forward.
  private var lastMicros = 0L // writer-thread only
  @volatile private var sub: Option[NotificationBus#Subscription] = None
  @volatile private var lastPrune = System.currentTimeMillis()

  private[log] def attach(bus: NotificationBus): Unit = {
    sub = Some(bus.subscribeAll(st => if (open.get()) { queue.put(st); () }))
  }

  /** Mailbox files written so far (observability + test sync). */
  def filesWritten: Long = written.get()

  /** Batches lost to persistent mailbox write failures. The mailbox is a
    * best-effort signal (consumers fall back to poll), but a drop should
    * be visible, not silent. */
  def droppedCount: Long = droppedBatches.get()

  private val writer = new Thread(() => {
    val batch = new java.util.ArrayList[SegmentStatus]()
    while (open.get() || !queue.isEmpty) {
      val head = queue.poll(50, TimeUnit.MILLISECONDS)
      if (head != null) {
        batch.clear()
        batch.add(head)
        queue.drainTo(batch) // everything already enqueued rides this file
        flush(batch)
      }
      maybePrune()
    }
  }, s"graft-push-publisher")
  writer.setDaemon(true)
  writer.start()

  private def flush(batch: java.util.ArrayList[SegmentStatus]): Unit =
    try {
      lastMicros = math.max(System.currentTimeMillis() * 1000L, lastMicros + 1)
      val name = PushBridge.ackFileName(lastMicros, seq.incrementAndGet(), nonce)
      val sb = new StringBuilder
      batch.forEach(st => { sb.append(PushBridge.encode(st)).append('\n'); () })
      sb.append(PushBridge.sentinel(batch.size())).append('\n')
      // tmp+rename via writeText: atomic-rename filesystems never show a
      // torn file; copy+delete stores are covered by the sentinel check
      LogFs.writeText(fs, s"$dir/$name", sb.toString)
      written.addAndGet(batch.size().toLong)
      ()
    } catch {
      // mailbox is best-effort signal, but a drop is counted, not silent
      case NonFatal(_) => droppedBatches.incrementAndGet(); ()
    }

  private def maybePrune(): Unit = {
    val now = System.currentTimeMillis()
    if (now - lastPrune > math.max(ttlMs / 4, 1L)) {
      lastPrune = now
      try {
        val d = new Path(dir)
        if (fs.exists(d))
          fs.listStatus(d)
            .filter(s => s.isFile && PushBridge.isAckFile(s.getPath.getName))
            .filter(_.getModificationTime < now - ttlMs)
            .foreach(s => { fs.delete(s.getPath, false); () })
      } catch { case NonFatal(_) => () }
    }
  }

  /** Detach from the bus, flush everything enqueued, stop the writer. */
  def close(): Unit = if (open.getAndSet(false)) {
    sub.foreach(_.close())
    writer.join(10000)
  }
}

/** Consumer side: tails the mailbox from the current end. On `file://`
  * the wait is a real WatchService push (the rescan-on-event pattern —
  * events only say "something changed", the listing says what, so
  * coalesced/lost events cannot drop acks); elsewhere it degrades to a
  * `pollMs` scan, the same bounded-latency contract follow() documents.
  * Files are processed in name order = (time, seq) publish order. */
final class PushSubscriber private[log] (
    fs: FileSystem,
    dir: String,
    space: Option[String],
    segment: Option[String],
    pollMs: Long,
    cb: SegmentStatus => Unit)
    extends AutoCloseable {

  private val open = new AtomicBoolean(true)
  private val deliveredCount = new AtomicLong(0L)
  private val ready = new CountDownLatch(1)

  fs.mkdirs(new Path(dir))
  // join at the current end: the ack feed is live-only by contract.
  // `seen` is bounded by the files alive within the publisher TTL —
  // names of pruned files are dropped on every scan.
  private val seen = mutable.Set[String](listAcks(): _*)

  private def listAcks(): Seq[String] = {
    val d = new Path(dir)
    if (!fs.exists(d)) Seq.empty
    else
      fs.listStatus(d)
        .collect {
          case s if s.isFile && PushBridge.isAckFile(s.getPath.getName) =>
            s.getPath.getName
        }
        .sorted
        .toSeq
  }

  private def drainNew(): Unit = {
    val listed = listAcks()
    listed.filterNot(seen).foreach { name =>
      try {
        val lines = LogFs.readLines(fs, s"$dir/$name")
        // incomplete = a copy+delete "rename" still in flight (S3A-style
        // stores list the file before its content is whole): leave it
        // UNSEEN and retry next tick — never skip past a torn ack
        if (PushBridge.isComplete(lines)) {
          lines.init.foreach {
            PushBridge.decode(_).foreach { st =>
              if (space.forall(_ == st.space) && segment.forall(_ == st.segment)) {
                try cb(st)
                catch { case NonFatal(_) => () } // subscriber isolation, as on the bus
                deliveredCount.incrementAndGet()
                ()
              }
            }
          }
          seen += name
          ()
        }
      } catch { case NonFatal(_) => () } // pruned mid-read: retry/forget next scan
    }
    // forget pruned names so the set stays TTL-bounded
    val live = listed.toSet
    seen.filterInPlace(live)
    ()
  }

  /** Acks that passed the filter and were handed to the callback. */
  def delivered: Long = deliveredCount.get()

  /** Blocks until the tailer thread is watching (test convenience). */
  def awaitReady(timeoutMs: Long = 10000L): Boolean =
    ready.await(timeoutMs, TimeUnit.MILLISECONDS)

  private def localWatchPath: Option[java.nio.file.Path] = {
    val uri = new Path(dir).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  private val tailer = new Thread(() => {
    localWatchPath match {
      case Some(p) =>
        val ws = p.getFileSystem.newWatchService()
        try {
          p.register(ws, java.nio.file.StandardWatchEventKinds.ENTRY_CREATE)
          ready.countDown()
          while (open.get()) {
            // the event is only a wake-up; drainNew() re-lists, so a
            // coalesced or overflowed event queue never loses an ack
            val key = ws.poll(pollMs, TimeUnit.MILLISECONDS)
            if (key != null) { key.pollEvents(); key.reset(); () }
            drainNew()
          }
        } finally ws.close()
      case None =>
        ready.countDown()
        while (open.get()) {
          drainNew()
          Thread.sleep(pollMs)
        }
    }
  }, "graft-push-subscriber")
  tailer.setDaemon(true)
  tailer.start()

  def close(): Unit = if (open.getAndSet(false)) tailer.join(10000)
}
