package graft.operators

import org.apache.spark.sql.DataFrame

/** The library's single lineage-cut / materialization primitive.
  *
  * Multi-stage operators (dedup candidate tables, tf/df tables, pipeline
  * stages) materialize an intermediate exactly once and fan it out to
  * several consumers. Two modes:
  *
  *  - default: `localCheckpoint()` — executor-local blocks, no
  *    distributed write. Fast, and right for single-node and short jobs,
  *    but the blocks are pinned to executors and lineage is severed, so
  *    ONE lost executor fails the job.
  *  - reliable: when the session has a checkpoint directory configured
  *    (`sc.setCheckpointDir(...)` on an HDFS/object-store path),
  *    `checkpoint()` writes the cut to that directory and the job
  *    survives executor loss — the right setting for long 100 TB runs,
  *    at the price of one distributed write per cut. Opt out (keep a
  *    checkpoint dir for other uses but cut locally) with
  *    `spark.graft.reliableMaterialize=false`.
  *
  * Superseded reliable snapshots are GC'd by Spark only with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; otherwise
  * clear the directory after the run (same contract as
  * [[graft.dedup.Dedup.duplicateClusters]]).
  */
object Materialize {

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined &&
      spark.conf.get("spark.graft.reliableMaterialize", "true").toBoolean
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }
}
