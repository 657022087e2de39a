package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe with scheduler instrumentation: run named queries and print,
  * per pass, wall time plus job/stage/task counts, summed task time,
  * shuffle bytes and spill — the "where does the second go" breakdown
  * Bench cannot show. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ProbeStats q_winnow_eval q_basket_pairs"
  *
  * Not part of the driver contract — a local iteration tool.
  */
object ProbeStats {

  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var spillB = 0L
    @volatile var inputB = 0L
    // (startMs, endMs, callSite) per job id — for the per-job gap trace
    val jobT =
      new scala.collection.mutable.LinkedHashMap[Int, (Long, Long, String)]
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
      shuffleReadB = 0L; shuffleWriteB = 0L; spillB = 0L; inputB = 0L
      jobT.clear()
    }
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized {
        jobs += 1
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        jobT(j.jobId) = (j.time, 0L, site)
      }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      synchronized {
        jobT.get(j.jobId).foreach(t => jobT(j.jobId) = (t._1, j.time, t._3))
      }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        spillB += m.diskBytesSpilled
        inputB += m.inputMetrics.bytesRead
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val shufflePartitions = sys.env.getOrElse(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS",
      graft.operators.AutoPartitions
        .derive(graft.operators.AutoPartitions.dirBytes(sfDir), cpus.toInt)
        .toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    spark.read.parquet(s"$sfDir/region.parquet").write
      .format("noop").mode("overwrite").save()
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-32s pass  wall_s   jobs stages  tasks tasktime_s shufW_MB shufR_MB spill_MB input_MB")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (p <- 1 to passes) {
        acc.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async: give it a beat to drain before reading
        Thread.sleep(300)
        println(
          f"$name%-32s $p%4d ${wall}%7.3f ${acc.jobs}%6d ${acc.stages}%6d ${acc.tasks}%6d ${acc.taskTimeMs / 1e3}%10.2f ${acc.shuffleWriteB / 1e6}%8.2f ${acc.shuffleReadB / 1e6}%8.2f ${acc.spillB / 1e6}%8.2f ${acc.inputB / 1e6}%8.2f")
        // last pass: per-job timeline (job wall + the scheduling/planning
        // gap since the previous job ended — where driver time hides)
        if (p == passes && sys.env.get("SPARK_GRAFT_JOBTRACE").contains("1")) {
          var prevEnd = 0L
          acc.jobT.foreach { case (id, (st, en, site)) =>
            val gap = if (prevEnd == 0L) 0L else st - prevEnd
            println(f"  [job] $name j$id%-5d wall=${(en - st) / 1e3}%7.3f gap_before=${gap / 1e3}%7.3f  $site")
            prevEnd = en
          }
        }
      }
    }
    spark.stop()
  }
}
