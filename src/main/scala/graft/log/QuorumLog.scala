package graft.log

import org.apache.spark.sql.Dataset

import graft.model.Record

/** Replicated produce across N event-log replicas with a majority-write
  * quorum — the reference's transaction quorum (reference:
  * server/pebble/quorum.go:1-100 majority = nodeCount/2 + 1;
  * supervisor.go:159-221 Write/Commit each gather majority ACKs, any
  * NACK fails the call), modeled as a two-phase commit over [[TxnLog]]s:
  *
  *  1. '''Write phase''': the batch is staged on every reachable
  *     replica. Staged data is invisible (TxnLog contract).
  *  2. '''Decision''': ≥ majority staged → commit on every replica that
  *     acked; fewer → roll every staged copy back and fail the produce.
  *     Either way no replica ever exposes a partial transaction.
  *
  * Replicas that were down during a committed write catch up through
  * [[reconcile]] (anti-entropy pull, the reference's Synchronize) — the
  * same recovery path the reference runs after a node rejoins.
  *
  * This is a protocol model over single-process stores: a real
  * deployment puts a network RPC where `txns(i).write` is and a
  * heartbeat registry behind [[majority]] (the reference's TTL'd node
  * map). The Spark-side mechanics — staged parquet, atomic-per-file
  * publish, distributed validation — are exactly the production ones.
  */
final class QuorumLog(val participants: Seq[EventLog]) {
  require(participants.nonEmpty, "quorum needs at least one participant")

  private val txns = participants.map(new TxnLog(_))

  /** Write quorum: majority of the replica set (quorum.go:99). */
  def majority: Int = participants.size / 2 + 1

  /** Test hook: replica indices that are "down" — their write phase
    * NACKs without touching the store, like an unreachable node. */
  private[graft] var downReplicas: Set[Int] = Set.empty

  /** Two-phase replicated produce. Returns the number of replicas the
    * transaction committed on (≥ [[majority]]); throws — after rolling
    * back every staged copy — if the write quorum is not reached. */
  def produce(
      trxId: String,
      space: String,
      segment: String,
      records: Dataset[Record],
      timestampUs: Long,
      trxNumber: Long): Int = {
    val acks = txns.zipWithIndex.map { case (t, i) =>
      if (downReplicas.contains(i)) false
      else
        try {
          t.write(trxId, space, segment, records, timestampUs, trxNumber)
          true
        } catch { case scala.util.control.NonFatal(_) => false }
    }
    val n = acks.count(identity)
    if (n < majority) {
      txns.zip(acks).foreach { case (t, ok) => if (ok) t.rollback(trxId) }
      throw new IllegalStateException(
        s"write quorum not reached: $n of ${participants.size} acked, need $majority")
    }
    // Decision = commit. A replica whose commit call fails mid-fan-out
    // must not keep the transaction half-applied (a partial publish
    // would be visible, and a staged leftover would NACK that trxId
    // forever): abort() purges both the staged remainder and any
    // already-published trx files, restoring the replica's
    // pre-transaction state — the committed data reaches it later
    // through [[reconcile]], the same path a down replica takes. Commit
    // on ≥1 replica is guaranteed or this throws.
    val committed = txns.zip(acks).map {
      case (t, true) =>
        try { t.commit(trxId); true }
        catch {
          case scala.util.control.NonFatal(_) =>
            try t.abort(trxId)
            catch { case scala.util.control.NonFatal(_) => () }
            false
        }
      case _ => false
    }
    val c = committed.count(identity)
    if (c == 0)
      throw new IllegalStateException(
        s"commit failed on every acked replica for $trxId")
    c
  }

  /** Anti-entropy pass: every replica pulls the tail it is missing from
    * every peer (reference: Synchronize, pebble/service.go:532). Brings
    * replicas that missed committed writes back in sync; idempotent.
    * Returns the total number of entries transferred. */
  def reconcile(): Long =
    participants.flatMap { p =>
      participants.collect { case o if o ne p => p.synchronize(o) }
    }.sum
}
