package graft.log

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import graft.model.SegmentStatus

/** In-process push-notification bus: producers fan [[SegmentStatus]]
  * acknowledgements out to space/segment subscribers the moment a write
  * commits — the push half of the reference's delivery story, where the
  * server publishes produce acks onto an in-process bus
  * (reference: broker/bus.go:1) and per-connection bidi streams drain it
  * to clients (reference: wsstream/bidi_stream.go:1,
  * http2/http2_stream_bus.go:1, client.go:188 SubscribeToSpace).
  *
  * Scope: this bus IS the server-side broker — same-process subscribers
  * (schedulers, cache warmers, monitoring, a follow() poller that wants
  * an early wake-up) get synchronous zero-latency delivery. Cross-
  * process consumers have two routes: [[PushBridge]] bridges this bus
  * across the JVM boundary (a filesystem ack mailbox with WatchService
  * push on local filesystems — the reference's per-connection stream
  * transports re-expressed), and [[graft.streaming.StreamLog.follow]]
  * reads the log itself with poll-interval-bound latency (its delivery
  * contract is documented there).
  *
  * Delivery contract: at-most-once per subscriber per status,
  * synchronous on the producing thread, AFTER the write is durably
  * visible. Callbacks must be fast and non-blocking (they run inside
  * produce); a throwing callback is isolated — it never fails the
  * produce or starves other subscribers — and counted in
  * [[droppedCount]]. Subscriptions are driver-side objects; the bus
  * never crosses the executor boundary.
  */
final class NotificationBus {

  import NotificationBus.Sub

  private val ids = new AtomicLong(0L)
  private val subs = TrieMap.empty[Long, Sub]
  private val dropped = new AtomicLong(0L)

  /** Handle to one subscription; `close()` detaches it (idempotent). */
  final class Subscription private[NotificationBus] (id: Long)
      extends AutoCloseable {
    def close(): Unit = { subs.remove(id); () }
    def isActive: Boolean = subs.contains(id)
  }

  private def add(
      space: Option[String],
      segment: Option[String],
      cb: SegmentStatus => Unit): Subscription = {
    val id = ids.incrementAndGet()
    subs(id) = Sub(space, segment, cb)
    new Subscription(id)
  }

  /** Every commit into any segment of `space` (reference:
    * client.go:188 SubscribeToSpace). */
  def subscribeToSpace(space: String)(cb: SegmentStatus => Unit): Subscription =
    add(Some(space), None, cb)

  /** Every commit into one segment (reference: SubscribeToSegment). */
  def subscribeToSegment(space: String, segment: String)(
      cb: SegmentStatus => Unit): Subscription =
    add(Some(space), Some(segment), cb)

  /** Every commit anywhere — the firehose a monitoring loop wants. */
  def subscribeAll(cb: SegmentStatus => Unit): Subscription =
    add(None, None, cb)

  def subscriberCount: Int = subs.size

  /** Callbacks that threw and were dropped (observability only). */
  def droppedCount: Long = dropped.get()

  /** Fan `statuses` out to every matching subscriber, in order.
    * Producer-side call — isolation per callback, never throws. */
  def publish(statuses: Seq[SegmentStatus]): Unit =
    if (subs.nonEmpty) statuses.foreach { st =>
      subs.values.foreach { s =>
        if (s.space.forall(_ == st.space) && s.segment.forall(_ == st.segment))
          try s.cb(st)
          catch { case NonFatal(_) => dropped.incrementAndGet(); () }
      }
    }
}

private[log] object NotificationBus {
  // companion-level so the pattern-match type test needs no outer ref
  final case class Sub(
      space: Option[String],
      segment: Option[String],
      cb: SegmentStatus => Unit)
}
