package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg (local iteration only): comma-separated query
    // names — dump just those and their oracles
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // a filtered run overwrites oracle_sql.json with the subset: into a
    // dir holding a full dump, the downstream gate would go green while
    // checking almost nothing — demand a fresh outDir instead
    if (only.isDefined &&
      Files.exists(Paths.get(s"$outDir/oracle_sql.json"))) {
      System.err.println(
        s"[verify] refusing filtered run into non-empty $outDir " +
          "(stale oracle_sql.json would shrink the gate); use a fresh dir")
      sys.exit(1)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // partitions ∝ input bytes, floor = cores (see Bench.scala — the
    // same rule, so a deep-decade verify run is sized like its bench)
    val shufflePartitions = sys.env.getOrElse(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS",
      graft.operators.AutoPartitions
        .derive(graft.operators.AutoPartitions.dirBytes(sfDir), cpus.toInt)
        .toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // runtime SMJ→SHJ conversion for the unhinted n-scaling joins
      // (see Bench.scala / Dedup.ngramJaccard)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as ns-Long, normalized
      // to µs by graft.sources.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
