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
final class QuorumLog(
    val participants: Seq[EventLog],
    val membership: Option[Membership] = None) {
  require(participants.nonEmpty, "quorum needs at least one participant")

  private val txns = participants.map(new TxnLog(_))

  /** Write quorum. Default: majority of the STATIC replica set
    * (quorum.go:99 arithmetic over a fixed size) — a partition can only
    * make writes fail, never shrink the bar. With a [[Membership]]
    * supplied, the majority derives from the LIVE node view exactly
    * like the reference (supervisor.go:191 GetWriteCount), including
    * its caveat: a node that sees its peers as dead lowers its own bar
    * (see Membership's doc; anti-entropy repairs on heal). */
  def majority: Int = membership match {
    case Some(m) => m.majority
    case None    => participants.size / 2 + 1
  }

  /** Test hook: replica indices that are "down" — their write phase
    * NACKs without touching the store, like an unreachable node. */
  private[graft] var downReplicas: Set[Int] = Set.empty

  /** Test hook: replica indices whose write phase fails AFTER staging
    * completes (a node dying mid-ack) — exercises the staged-leftover
    * cleanup. */
  private[graft] var failAfterStageReplicas: Set[Int] = Set.empty

  /** Two-phase replicated produce. Returns the number of replicas the
    * transaction committed on (≥ [[majority]]); throws — after rolling
    * back every staged copy — if the write quorum is not reached, and
    * throws — after aborting the under-replicated commits — if the
    * COMMIT quorum is not reached either (the reference gathers
    * majority ACKs on both phases, supervisor.go:159-221). */
  def produce(
      trxId: String,
      space: String,
      segment: String,
      records: Dataset[Record],
      timestampUs: Long,
      trxNumber: Long): Int = {
    // one materialization fans out to every replica: an uncached
    // nondeterministic plan could stage DIFFERENT payloads under the
    // same sequences on different replicas — a divergence high-water
    // anti-entropy can never detect (and N× the compute)
    val cached = records.cache()
    try produceCached(trxId, space, segment, cached, timestampUs, trxNumber)
    finally cached.unpersist(false)
  }

  private def produceCached(
      trxId: String,
      space: String,
      segment: String,
      records: Dataset[Record],
      timestampUs: Long,
      trxNumber: Long): Int = {
    val acks = txns.zipWithIndex.map { case (t, i) =>
      if (downReplicas.contains(i)) false
      else {
        // a failed write may die AFTER creating staged/<trxId> — clean
        // the partial staged dir or that trxId NACKs on this replica
        // forever. Only clean what THIS attempt created: a pre-existing
        // staged dir belongs to someone else and is the NACK reason.
        val preStaged = t.isStaged(trxId)
        try {
          t.write(trxId, space, segment, records, timestampUs, trxNumber)
          if (failAfterStageReplicas.contains(i))
            throw new java.io.IOException(s"injected post-stage failure on replica $i")
          true
        } catch {
          case scala.util.control.NonFatal(_) =>
            if (!preStaged)
              try t.rollback(trxId)
              catch { case scala.util.control.NonFatal(_) => () }
            false
        }
      }
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
    // through [[reconcile]], the same path a down replica takes. The
    // commit phase needs ≥ majority successes or the whole produce is
    // rolled back and fails (checked below).
    var inconsistent = List.empty[(Int, Throwable)]
    val committed = txns.zipWithIndex.zip(acks).map {
      case ((t, i), true) =>
        try { t.commit(trxId); true }
        catch {
          case scala.util.control.NonFatal(_) =>
            try t.abort(trxId)
            catch {
              case scala.util.control.NonFatal(e) =>
                // abort ALSO failed: this replica may expose a partial
                // publish that high-watermark anti-entropy cannot
                // repair — this must surface, never be swallowed
                inconsistent ::= (i, e)
            }
            false
        }
      case _ => false
    }
    val c = committed.count(identity)
    if (inconsistent.nonEmpty) {
      val ex = new IllegalStateException(
        s"commit of $trxId failed AND abort failed on replica(s) " +
          s"${inconsistent.map(_._1).sorted.mkString(",")} — possible partial " +
          s"publish; repair with TxnLog.abort('$trxId') on those replicas " +
          s"BEFORE any compact()/retain() there (compaction folds away the " +
          s"trx file prefix the sweep needs), then reconcile() " +
          s"(committed on $c of ${participants.size})")
      inconsistent.foreach { case (_, e) => ex.addSuppressed(e) }
      throw ex
    }
    if (c < majority) {
      // the COMMIT quorum failed too: a transaction durable on fewer
      // than majority replicas could be lost wholesale before
      // reconcile() runs, so "success" here would be a lie. Restore
      // the pre-transaction state on the replicas that did commit
      // (abort purges the published trx files) and fail the produce.
      var unAborted = List.empty[(Int, Throwable)]
      txns.zipWithIndex.zip(committed).foreach {
        case ((t, i), true) =>
          try t.abort(trxId)
          catch { case scala.util.control.NonFatal(e) => unAborted ::= (i, e) }
        case _ => ()
      }
      if (unAborted.nonEmpty) {
        val ex = new IllegalStateException(
          s"commit quorum not reached for $trxId ($c of ${participants.size}, " +
            s"need $majority) AND abort failed on replica(s) " +
            s"${unAborted.map(_._1).sorted.mkString(",")} — repair with " +
            s"TxnLog.abort('$trxId') there, then reconcile()")
        unAborted.foreach { case (_, e) => ex.addSuppressed(e) }
        throw ex
      }
      throw new IllegalStateException(
        s"commit quorum not reached: $c of ${participants.size} committed, " +
          s"need $majority — transaction rolled back everywhere")
    }
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
