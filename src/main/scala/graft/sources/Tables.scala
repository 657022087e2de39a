package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver's testdata layout.
  *
  * `events.ts` is physically TIMESTAMP(NANOS), which Spark reads as a
  * nanosecond Long under `spark.sql.legacy.parquet.nanosAsLong=true`
  * (set by Verify/Bench/tests). All event-time logic flows through a
  * normalized `ts_us` µs-since-epoch BIGINT so both physical encodings —
  * and the DuckDB oracle's `epoch_us(ts)` — agree exactly.
  */
object Tables {

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table with a `ts_us` column appended. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = apply(s, dir, "events")
    val tsUs: Column = df.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000")
      case _        => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("ts_us", tsUs)
  }

  /** µs-since-epoch of a (possibly NTZ) timestamp column; session TZ is
    * UTC so the NTZ→UTC cast is the identity mapping. */
  def tsUsOf(c: Column): Column = unix_micros(c.cast("timestamp"))
}
