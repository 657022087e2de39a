package graft

import org.apache.spark.sql.functions._

import graft.queries.OlapQueries

/** Behavioral checks for OLAP queries whose driver oracle runs on the
  * full synthetic tables — crafted inputs here pin the exact semantics.
  */
class OlapSpec extends SparkSpec {

  import spark.implicits._

  test("cohort retention matrix on crafted events") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString
    Seq(
      // user 1: cohort Jan 1, returns day+1 and day+3
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-04 23:59:59"),
      // user 2: cohort Jan 2, two events on day 0 count once
      (2L, "2024-01-02 08:00:00"),
      (2L, "2024-01-02 20:00:00"),
      (2L, "2024-01-03 00:00:01"),
      // user 3: cohort Jan 1, returns day+1
      (3L, "2024-01-01 00:00:00"),
      (3L, "2024-01-02 12:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    val cells = OlapQueries
      .qRetention(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(cells == Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 3 on their first day
      ("2024-01-01", 1L) -> 2L, // both return the next day
      ("2024-01-01", 3L) -> 1L, // only user 1 at day+3
      ("2024-01-02", 0L) -> 1L, // user 2's double event counts once
      ("2024-01-02", 1L) -> 1L))
  }
}
