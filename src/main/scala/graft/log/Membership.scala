package graft.log

import scala.collection.concurrent.TrieMap

/** TTL'd heartbeat membership registry — the reference's failure
  * detector (reference: server/pebble/quorum.go:11-101 TTL'd node map
  * with live-count quorum arithmetic; observer.go:98-133 gossip
  * heartbeats + explicit shutdown).
  *
  * Protocol, as the reference runs it: each node periodically
  * broadcasts `(self, its whole node map)`; a receiver merges the map,
  * stamping the SENDER "now" and keeping carried timestamps for the
  * rest, and any NEWLY discovered node triggers an immediate re-gossip
  * (the positive return of [[heartbeat]]) so membership converges in
  * O(log n) rounds instead of one TTL period. A node is live while its
  * last heartbeat is younger than `ttlMs` (15 s in the reference); an
  * explicit shutdown removes it immediately; quorum sizes derive from
  * the LIVE count (`count/2 + 1`).
  *
  * Mirrored caveat, stated rather than hidden: deriving majority from
  * the live VIEW means a partition that hides peers SHRINKS the
  * majority — an isolated node sees activeNodeCount 1 and would accept
  * writes alone, to be repaired by anti-entropy on heal (the
  * reference's Synchronize-on-rejoin). [[QuorumLog]] therefore keeps
  * its static replica-set majority unless a Membership is explicitly
  * supplied.
  *
  * Driver-side control plane (the reference's registry is one sync.Map
  * per server process); `clock` is injectable so specs are
  * deterministic. Thread-safe.
  */
final class Membership(
    val node: String,
    val ttlMs: Long = 15000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val peers = TrieMap.empty[String, Long]

  /** Merge one gossip heartbeat from `from` carrying its node map: the
    * sender is stamped "now", carried nodes keep their carried
    * timestamps (monotone — a stale gossip never moves a heartbeat
    * backwards). Self-heartbeats are ignored (observer.go:99). Returns
    * the number of NEWLY discovered nodes; a positive return is the
    * signal to re-gossip immediately (observer.go:114-119). */
  def heartbeat(from: String, nodes: Map[String, Long] = Map.empty): Int = {
    if (from == node) return 0
    val merged = nodes + (from -> clock())
    merged.count { case (n, ts) =>
      if (n == node) false
      else {
        val isNew = !peers.contains(n)
        val prev = peers.getOrElse(n, Long.MinValue)
        if (ts > prev) peers(n) = ts
        isNew
      }
    }
  }

  /** Explicit departure (reference: NodeShutdown → SetOffline) —
    * removal is immediate, no TTL wait. */
  def setOffline(peer: String): Unit = peers.remove(peer)

  /** Last-heartbeat map of known peers, self excluded (GetNodes). */
  def nodes(): Map[String, Long] = peers.toMap

  /** Live node count: self + peers whose last heartbeat is within the
    * TTL (quorum.go:76-87 — expiry needs no sweeper, liveness is
    * evaluated at read time). */
  def activeNodeCount: Int = {
    val now = clock()
    1 + peers.valuesIterator.count(ts => now - ts < ttlMs)
  }

  def isSingleInstance: Boolean = activeNodeCount == 1

  /** Majority of the LIVE view (quorum.go:99: count/2 + 1). */
  def majority: Int = activeNodeCount / 2 + 1
}
