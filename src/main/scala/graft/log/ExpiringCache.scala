package graft.log

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

/** TTL'd key→value cache with an amortized eviction sweep — the
  * reference fronts its LSM reads with exactly this shape (reference:
  * server/cache.go:18 ExpiringCache — sync.Map + per-entry expiration +
  * a cleanup pass; server/pebble/service.go:102 instantiates it at
  * 2 min TTL / 1 min sweep).
  *
  * Semantics:
  *  - `get`/`getOrElseUpdate` treat an expired entry as absent (and drop
  *    it), so a reader can never act on state older than `ttlMs` — the
  *    bound that makes a cache coherent-enough when OTHER writers may
  *    touch the underlying store without calling invalidate.
  *  - every write re-arms the entry's TTL (the reference's `Set`).
  *  - expired entries that are never re-read are reclaimed by a sweep
  *    that runs AMORTIZED on writes at most every `sweepIntervalMs` —
  *    same bound as the reference's cleanup goroutine without needing a
  *    thread per cache (a driver may hold many EventLogs).
  *  - `nowMs` injects the clock: production uses the wall clock; specs
  *    pass a manual clock so TTL-boundary behavior is asserted exactly,
  *    without sleeps that flake under suite load.
  */
final class ExpiringCache[K, V](
    ttlMs: Long = 2 * 60 * 1000L,
    sweepIntervalMs: Long = 60 * 1000L,
    nowMs: () => Long = () => System.currentTimeMillis()) {
  require(ttlMs > 0 && sweepIntervalMs > 0, "ttl and sweep interval must be positive")

  private final case class Item(value: V, expiresAt: Long)
  private val store = TrieMap.empty[K, Item]
  private val lastSweep = new AtomicLong(nowMs())

  def get(k: K): Option[V] = store.get(k) match {
    case Some(it) if nowMs() <= it.expiresAt => Some(it.value)
    case Some(_) => store.remove(k); None
    case None => None
  }

  /** Present-and-fresh check without computing a fallback. */
  def contains(k: K): Boolean = get(k).isDefined

  def getOrElseUpdate(k: K, compute: => V): V = get(k) match {
    case Some(v) => v
    case None =>
      val v = compute
      put(k, v)
      v
  }

  def put(k: K, v: V): Unit = {
    store.put(k, Item(v, nowMs() + ttlMs))
    maybeSweep()
  }

  def remove(k: K): Unit = { store.remove(k); () }

  /** Drop every key matching `p` (expired or not). */
  def removeIf(p: K => Boolean): Unit =
    store.keySet.filter(p).foreach(store.remove)

  def clear(): Unit = store.clear()

  /** Live (unexpired) entry count — expired-but-unswept entries don't
    * count, mirroring the reference's read-side expiry. */
  def size: Int = {
    val now = nowMs()
    store.count { case (_, it) => now <= it.expiresAt }
  }

  /** Raw slot count including expired-but-unswept entries (sweep
    * observability for the spec). */
  private[graft] def rawSize: Int = store.size

  /** Eviction pass, amortized behind writes: at most one scan per
    * `sweepIntervalMs`, dropping entries whose TTL has lapsed. */
  private def maybeSweep(): Unit = {
    val now = nowMs()
    val last = lastSweep.get()
    if (now - last >= sweepIntervalMs && lastSweep.compareAndSet(last, now)) {
      store.foreach { case (k, it) => if (now > it.expiresAt) store.remove(k) }
    }
  }

  /** Immediate eviction pass (close/test hook). */
  def sweepNow(): Unit = {
    val now = nowMs()
    lastSweep.set(now)
    store.foreach { case (k, it) => if (now > it.expiresAt) store.remove(k) }
  }
}
