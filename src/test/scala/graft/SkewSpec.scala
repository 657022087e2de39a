package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin equals the plain join on a hot-keyed fact") {
    // hot key: 90% of rows share l_key = 1
    val big = spark
      .range(0, 10000)
      .select(
        when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (11L, "a"), (23L, "b"), (999999L, "absent"))
      .toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key even when the big side is key-clustered") {
    // big side pre-shuffled BY THE JOIN KEY — the layout where a
    // per-partition salt would collapse to one value per hot key
    val big = spark
      .range(0, 10000)
      .select(
        when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      .repartition(col("k"))
    val small = Seq((1L, "hot"), (11L, "a"), (23L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin handles map-typed columns on the big side") {
    val big = spark
      .range(0, 100)
      .select(
        (col("id") % 3).as("k"),
        col("id").as("payload"),
        map(lit("m"), col("id").cast("string")).as("meta"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, Seq("k"), buckets = 4)
    assert(out.count() == 100)
  }

  test("saltedJoin left join preserves unmatched big-side rows") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val small = Seq((1L, "m")).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "left")
    assert(out.count() == 2)
    assert(out.filter(col("k") === 2 && col("w").isNull).count() == 1)
  }

  test("saltedJoin rejects right joins") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, Seq("k"), 4, joinType = "right")
    }
  }

  test("AQE splits a skewed shuffle partition when mappers allow it") {
    // The automatic complement to saltedJoin: AQE detects a reduce
    // partition exceeding factor×median AND the byte threshold, and
    // splits it across tasks (duplicating the matching build-side
    // partition). The split is MAPPER-granular — a skewed partition
    // whose bytes all come from one map task cannot be split (e.g. a
    // single-row-group parquet file scans as one mapper no matter how
    // small maxPartitionBytes is), so the input here is an 8-partition
    // range. Thresholds are scaled down to test size; defaults
    // (256MB/5x) are production-correct.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of rows share k=0 → one reduce partition holds ~57k rows
      // while the median partition is near-empty.
      val ev = spark
        .range(0L, 60000L, 1L, 8)
        .select(
          when(pmod(col("id"), lit(100)) < 95, 0L).otherwise(col("id")).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val dim = ev.select(col("k")).distinct().localCheckpoint()
      val joined = ev.join(dim.withColumnRenamed("k", "k2"), col("k") === col("k2"))
      assert(joined.count() == 60000)
      // collect() again on the same DF: executedPlan now holds the
      // final adaptive plan (a noop write would execute a clone).
      joined.collect()
      val fin = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      assert(fin.toString.contains("skew=true"), s"no skew split in:\n$fin")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-phase countDistinct equals count_distinct") {
    val df = spark
      .range(0, 5000)
      .select(
        (col("id") % 7).as("g"),
        (col("id") % 131).as("v"))
    val expected = df
      .groupBy("g")
      .agg(count_distinct(col("v")).as("n_distinct"))
    val actual = Skew.countDistinct(df, Seq("g"), "v")
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)
  }

  test("two-phase countDistinct ignores NULL values like count_distinct") {
    // distinct() keeps a (g, NULL) pair; phase 2 must not count it
    val df = spark
      .range(0, 100)
      .select(
        (col("id") % 2).as("g"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 5).as("v"))
    val expected = df.groupBy("g").agg(count_distinct(col("v")).as("n_distinct"))
    val actual = Skew.countDistinct(df, Seq("g"), "v")
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)
  }

  test("fulfillment under a hot orderkey: skewed fan-in equals its pre-collapsed twin") {
    // 90% of lineitems pile onto orderkey 1 — broadcast-infeasible at
    // scale (both sides fact-sized) and reducer-hostile if the join ran
    // on raw rows. The per-orderkey min/max collapses the hot key
    // map-side, so the skewed input must produce EXACTLY the result of
    // an equivalent input already collapsed to each order's first/last
    // shipment (metamorphic twin; the percentile stage is shared).
    val n = 20000L
    val li = spark
      .range(0, n)
      .select(
        when(col("id") % 10 < 9, lit(1L)).otherwise(col("id")).as("l_orderkey"),
        expr("date_add(date'1995-01-01', cast(id % 300 as int))").as("l_shipdate"))
    val orders = spark
      .range(0, n)
      .select(
        col("id").as("o_orderkey"),
        concat(lit("P"), (col("id") % 3).cast("string")).as("o_orderpriority"),
        expr("date_add(date'1994-12-01', cast(id % 7 as int))").as("o_orderdate"))
    val collapsed = li
      .groupBy("l_orderkey")
      .agg(min("l_shipdate").as("a"), max("l_shipdate").as("b"))
      .select(col("l_orderkey"), explode(array(col("a"), col("b"))).as("l_shipdate"))
    val skewed = graft.queries.OlapQueries.fulfillment(orders, li)
    val twin = graft.queries.OlapQueries.fulfillment(orders, collapsed)
    assert(skewed.exceptAll(twin).isEmpty && twin.exceptAll(skewed).isEmpty)
    // and the hot key really was hot: one order owns 90% of the fact side
    assert(li.filter(col("l_orderkey") === 1L).count() == n * 9 / 10)
  }
}
