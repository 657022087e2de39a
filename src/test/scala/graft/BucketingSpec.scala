package graft

import org.apache.spark.sql.functions._

/** The bucketing story SURVEY §5 claims, demonstrated: two tables
  * bucketed on the join key co-locate, so the join runs with NO shuffle
  * exchange on either side — the layout a 100 TB log deployment would
  * use for segment-aligned joins. */
class BucketingSpec extends SparkSpec {

  test("joins on the bucket key run without a shuffle exchange") {
    val db = "graft_bucketing_spec"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      val orders = spark.read.parquet(s"$SfDir/orders.parquet")
      val lineitem = spark.read.parquet(s"$SfDir/lineitem.parquet")
      orders.write
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      lineitem.write
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark
        .table(s"$db.lineitem_b")
        .join(
          spark.table(s"$db.orders_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // and it still returns the right rows
      assert(joined.count() ==
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
