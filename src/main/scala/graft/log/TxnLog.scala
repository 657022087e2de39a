package graft.log

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.model.Record

/** Two-phase write staging on top of [[EventLog]] — the reference's
  * Write / Commit / Rollback protocol (reference: pebble/service.go:
  * 414-530) mapped onto directory-staged parquet:
  *
  *  - `write` stages a validated batch under `path/staged/<trxId>/`
  *    (invisible to readers — `EventLog.load` only reads `path/data`),
  *  - `commit` atomically publishes the staged files into the data dir
  *    (rename, no rewrite) — mirrors the reference applying the staged
  *    transaction batch,
  *  - `rollback` deletes the staged directory — mirrors the reference
  *    deleting the staged transaction key.
  *
  * On a real cluster the same protocol runs against an object store with
  * a manifest commit (the staged-dir rename becomes a manifest swap);
  * single-writer-per-segment is assumed, as in the reference.
  */
final class TxnLog(val log: EventLog) {
  private val spark = log.spark
  private val stagedRoot = s"${log.path}/staged"
  private val dataDir = s"${log.path}/data"

  /** Stage a contiguous batch; returns the staged trx id. Validation is
    * identical to [[EventLog.produce]] but nothing becomes visible. */
  def write(
      trxId: String,
      space: String,
      segment: String,
      records: Dataset[Record],
      timestampUs: Long,
      trxNumber: Long): Unit = {
    val last = log.peek(space, segment)
    val lastSeq = last.map(_.sequence).getOrElse(0L)
    val lastTrx = last.map(_.trxNumber).getOrElse(0L)
    require(
      trxNumber == lastTrx + 1,
      s"transaction number mismatch: expected ${lastTrx + 1}, got $trxNumber")
    val stats = records
      .agg(
        count(lit(1)).as("n"),
        min("sequence").as("lo"),
        max("sequence").as("hi"),
        count_distinct(col("sequence")).as("nd"))
      .head()
    val (n, lo, hi, nd) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    require(
      n > 0 && lo == lastSeq + 1 && hi == lastSeq + n && nd == n,
      s"sequence mismatch staging trx $trxId")
    records
      .select(
        lit(space).as("space"),
        lit(segment).as("segment"),
        col("sequence"),
        lit(timestampUs).as("timestamp"),
        lit(trxNumber).as("trxNumber"),
        col("payload"),
        col("metadata"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("space")
      .parquet(s"$stagedRoot/$trxId")
  }

  /** Publish a staged transaction: move its parquet files under the data
    * dir. File moves are atomic per file on a POSIX fs; readers only ever
    * see complete parquet files. */
  def commit(trxId: String): Unit = {
    val staged = Paths.get(s"$stagedRoot/$trxId")
    require(Files.exists(staged), s"transaction not found: $trxId")
    Files.createDirectories(Paths.get(dataDir))
    Files
      .walk(staged)
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .forEach { p =>
        val rel = staged.relativize(p.getParent).toString
        val target = Paths.get(dataDir, rel)
        Files.createDirectories(target)
        Files.move(p, target.resolve(s"trx-$trxId-${p.getFileName}"))
      }
    deleteRecursively(staged)
  }

  /** Drop a staged transaction (reference: Rollback — delete the staged
    * key, no-op if absent). */
  def rollback(trxId: String): Unit = {
    val staged = Paths.get(s"$stagedRoot/$trxId")
    if (Files.exists(staged)) deleteRecursively(staged)
  }

  def staged(): Seq[String] = {
    val root = Paths.get(stagedRoot)
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      } finally s.close()
    }
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder()).forEach(Files.delete(_))
}
