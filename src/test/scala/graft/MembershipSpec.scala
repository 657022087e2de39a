package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.log.Membership

/** The TTL'd gossip failure detector (reference: quorum.go node map +
  * observer.go heartbeat handling) — pure driver-side state machine, so
  * no Spark session needed; the clock is injected for determinism. */
class MembershipSpec extends AnyFunSuite {

  private def at(t0: Long): (Membership, Long => Unit) = {
    var now = t0
    val m = new Membership("n1", ttlMs = 15000L, clock = () => now)
    (m, t => now = t)
  }

  test("gossip merge: sender stamped now, carried nodes kept, news counted") {
    val (m, tick) = at(1000L)
    // first heartbeat from n2 carrying its view of n3 (older stamp)
    assert(m.heartbeat("n2", Map("n3" -> 500L)) == 2) // both newly discovered
    assert(m.nodes() == Map("n2" -> 1000L, "n3" -> 500L))
    // re-gossip with nothing new returns 0 — the convergence signal
    tick(2000L)
    assert(m.heartbeat("n2", Map("n3" -> 800L)) == 0)
    assert(m.nodes() == Map("n2" -> 2000L, "n3" -> 800L))
    // a STALE carried timestamp never moves a heartbeat backwards
    assert(m.heartbeat("n3", Map("n2" -> 100L)) == 0)
    assert(m.nodes()("n2") == 2000L)
    // self-heartbeats and self entries in carried maps are ignored
    assert(m.heartbeat("n1", Map("n9" -> 1L)) == 0)
    assert(m.heartbeat("n2", Map("n1" -> 9999L)) == 0)
    assert(!m.nodes().contains("n1"))
  }

  test("liveness: TTL expiry at read time, explicit shutdown immediate") {
    val (m, tick) = at(0L)
    m.heartbeat("n2")
    m.heartbeat("n3")
    assert(m.activeNodeCount == 3 && m.majority == 2 && !m.isSingleInstance)
    // n2 and n3 last heartbeat at t=0: just inside the TTL...
    tick(14999L)
    assert(m.activeNodeCount == 3)
    // ...and expired past it, with no sweeper needed
    tick(15000L)
    assert(m.activeNodeCount == 1 && m.majority == 1 && m.isSingleInstance)
    // a fresh heartbeat revives; explicit shutdown removes immediately
    m.heartbeat("n2")
    assert(m.activeNodeCount == 2)
    m.setOffline("n2")
    assert(m.activeNodeCount == 1)
  }

  test("gossip converges a 4-node mesh in two rounds (new-discovery returns drive re-gossip)") {
    var now = 0L
    val nodes = Seq("a", "b", "c", "d").map(n =>
      n -> new Membership(n, ttlMs = 15000L, clock = () => now)).toMap
    // round 1: a ring of single heartbeats — everyone knows a neighbor
    assert(nodes("b").heartbeat("a", nodes("a").nodes()) == 1)
    assert(nodes("c").heartbeat("b", nodes("b").nodes()) == 2) // b + carried a
    assert(nodes("d").heartbeat("c", nodes("c").nodes()) == 3)
    now = 1L
    // round 2: d's full map closes the loop — everyone discovers everyone
    assert(nodes("a").heartbeat("d", nodes("d").nodes()) == 3)
    assert(nodes("b").heartbeat("a", nodes("a").nodes()) == 2) // c, d new to b
    assert(nodes("c").heartbeat("b", nodes("b").nodes()) == 1) // d new to c
    assert(nodes.values.forall(_.activeNodeCount == 4))
    assert(nodes.values.forall(_.majority == 3))
  }
}
