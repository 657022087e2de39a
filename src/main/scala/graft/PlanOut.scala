package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named queries to
  * individual files — the plans/r14/<query>_{before,after}.txt artifacts.
  *
  *   sbt "runMain graft.PlanOut /root/testdata/sf0.1 plans/r14 _before q_a q_b"
  */
object PlanOut {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config(
        "spark.sql.shuffle.partitions",
        graft.operators.AutoPartitions
          .derive(graft.operators.AutoPartitions.dirBytes(sfDir), 32)
          .toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
        plan)
      println(s"[planout] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
