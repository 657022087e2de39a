package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Inferential statistics over the star schema (SURVEY §2b rows
  * 30bf–30bi): hypothesis tests and robust trend estimators whose
  * decision numbers must be ENGINE-EXACT to be trustworthy as a gate.
  *
  * The determinism recipe (shared with [[OlapQueries]] /
  * [[TpchQueries]]): aggregate in exact integer / decimal fixed point
  * (sums of cents, sums of squared cents, signed pair counts), convert
  * to float only in the FINAL scalar formula — identical IEEE operand
  * trees on identical exact inputs give identical doubles in every
  * engine — and emit through the `floor(x·10⁶ + 0.5)/10⁶` tie rule.
  * Nothing here depends on float accumulation order.
  */
object StatsQueries {

  import graft.operators.SortUtil.sortSmall

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  private def floor6(c: Column): Column =
    floor(c * 1000000.0d + 0.5d) / 1000000.0d

  private def floor6Sql(e: String): String =
    s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** Month index of an order date: months since 1995-01. */
  private def monthIdx(c: Column): Column =
    ((year(c) - 1995) * 12 + month(c) - 1).cast("long")

  private val MonthIdxSql = "(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1"

  // ---------------------------------------------------------------
  // Welch's t-test
  // ---------------------------------------------------------------

  /** Welch's unequal-variance t-test: do purchase events carry a
    * different mean value than non-purchase events? The scalable
    * shape: ONE map-side-combinable aggregate per group over exact
    * integer cents — n, Σc (int64), Σc² (decimal 38 — a cents² term
    * is ~2⁵¹, a long sum would overflow at corpus scale) — then the
    * t statistic and Welch–Satterthwaite df are pure scalar IEEE
    * arithmetic on the two exact triples. No per-row float ever sums. */
  def qWelchTtest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        (col("event_type") === "purchase").as("grp"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val g = ev
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n"),
        sum("c").as("sc"),
        sum(dec(col("c")) * col("c")).as("sq"))
    val a = g.filter(col("grp"))
      .select(col("n").as("n_a"), col("sc").as("sc_a"), col("sq").as("sq_a"))
    val b = g.filter(!col("grp"))
      .select(col("n").as("n_b"), col("sc").as("sc_b"), col("sq").as("sq_b"))
    a.crossJoin(broadcast(b))
      .selectExpr(
        "n_a",
        "n_b",
        "CAST(sc_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 100.0) AS mean_a",
        "CAST(sc_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 100.0) AS mean_b",
        "(CAST(sq_a AS DOUBLE) - CAST(sc_a AS DOUBLE) * CAST(sc_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / ((CAST(n_a AS DOUBLE) - 1.0) * 10000.0) AS var_a",
        "(CAST(sq_b AS DOUBLE) - CAST(sc_b AS DOUBLE) * CAST(sc_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / ((CAST(n_b AS DOUBLE) - 1.0) * 10000.0) AS var_b")
      .selectExpr(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        "var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2")
      .select(
        col("n_a"),
        col("n_b"),
        floor6(col("mean_a")).as("mean_a"),
        floor6(col("mean_b")).as("mean_b"),
        floor6((col("mean_a") - col("mean_b")) / sqrt(col("se2"))).as("t_stat"),
        floor6(
          col("se2") * col("se2") /
            ((col("var_a") / col("n_a")) * (col("var_a") / col("n_a")) /
              (col("n_a") - 1.0d) +
              (col("var_b") / col("n_b")) * (col("var_b") / col("n_b")) /
                (col("n_b") - 1.0d))).as("df"))
  }

  // ---------------------------------------------------------------
  // Mann–Kendall trend test
  // ---------------------------------------------------------------

  /** Two-sided 5% critical value, spelled to µ-precision so the
    * boundary compare runs on the exact same literal in both engines. */
  val MkCritical = 1.959964d

  /** Mann–Kendall monotonic-trend test on monthly order counts: the
    * non-parametric "is demand trending" gate. S = Σ sign(cⱼ−cᵢ) over
    * month pairs and the tie-corrected variance are EXACT int64 (the
    * pair join runs on the month-count statistic table — |months|²
    * pairs, bounded, broadcast — never on the fact table, which folds
    * to per-month counts first). Only the final z is float. */
  def qMannKendall(s: SparkSession, d: String): DataFrame = {
    val m = t(s, d, "orders")
      .groupBy(monthIdx(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("c"))
    val pairs = m
      .select(col("m").as("ma"), col("c").as("ca"))
      .join(broadcast(m.select(col("m").as("mb"), col("c").as("cb"))), col("ma") < col("mb"))
    val sStat = pairs.agg(
      sum(
        when(col("cb") > col("ca"), 1L)
          .when(col("cb") < col("ca"), -1L)
          .otherwise(0L)).as("s_stat"))
    val ties = m
      .groupBy("c")
      .agg(count(lit(1)).as("tk"))
      .filter(col("tk") > 1)
      .agg(
        coalesce(
          sum(col("tk") * (col("tk") - 1) * (lit(2L) * col("tk") + 5)),
          lit(0L)).as("tie_term"))
    val nn = m.agg(count(lit(1)).as("n_periods"))
    nn.crossJoin(broadcast(sStat))
      .crossJoin(broadcast(ties))
      .withColumn(
        "var18",
        col("n_periods") * (col("n_periods") - 1) *
          (lit(2L) * col("n_periods") + 5) - col("tie_term"))
      .withColumn(
        "z_stat",
        when(
          col("s_stat") > 0,
          (col("s_stat") - 1L).cast("double") /
            sqrt(col("var18").cast("double") / 18.0d))
          .when(
            col("s_stat") < 0,
            (col("s_stat") + 1L).cast("double") /
              sqrt(col("var18").cast("double") / 18.0d))
          .otherwise(0.0d))
      .select(
        col("n_periods"),
        col("s_stat"),
        (col("var18").cast("double") / 18.0d).as("var_s"),
        floor6(col("z_stat")).as("z_stat"),
        when(col("z_stat") > MkCritical, "increasing")
          .when(col("z_stat") < -MkCritical, "decreasing")
          .otherwise("none").as("trend"))
  }

  // ---------------------------------------------------------------
  // Theil–Sen robust trend line
  // ---------------------------------------------------------------

  /** Theil–Sen estimator on monthly order counts: the median of all
    * pairwise slopes (robust to outlier months where least squares is
    * not), intercept = median residual. Slopes are single IEEE
    * divisions of exact int64 deltas (identical doubles in every
    * engine); both medians are RANK PICKS over a deterministic
    * (value, key) order — the even-size case averages the two middle
    * doubles, also engine-exact. Pair set is |months|², statistic-
    * sized, broadcast. */
  def qTheilSen(s: SparkSession, d: String): DataFrame = {
    val m = t(s, d, "orders")
      .groupBy(monthIdx(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("c"))
    val pairs = m
      .select(col("m").as("ma"), col("c").as("ca"))
      .join(broadcast(m.select(col("m").as("mb"), col("c").as("cb"))), col("ma") < col("mb"))
      .select(
        ((col("cb") - col("ca")).cast("double") /
          (col("mb") - col("ma")).cast("double")).as("slope"),
        col("ma"),
        col("mb"))
    val ranked = pairs.withColumn(
      "rk",
      row_number().over(Window.orderBy("slope", "ma", "mb")).cast("long"))
    val cnt = ranked.agg(max("rk").as("n_pairs"))
    val slopeMed = ranked
      .crossJoin(broadcast(cnt))
      .filter(
        col("rk") === expr("(n_pairs + 1) DIV 2") ||
          col("rk") === expr("(n_pairs + 2) DIV 2"))
      .agg(avg("slope").as("slope_med"), max("n_pairs").as("n_pairs"))
    val resid = m
      .crossJoin(broadcast(slopeMed))
      .select(
        col("n_pairs"),
        col("slope_med"),
        (col("c").cast("double") - col("slope_med") * col("m").cast("double"))
          .as("r"),
        col("m"))
    val rankedR = resid.withColumn(
      "rk",
      row_number().over(Window.orderBy("r", "m")).cast("long"))
    val cntR = rankedR.agg(max("rk").as("n_points"))
    rankedR
      .crossJoin(broadcast(cntR))
      .filter(
        col("rk") === expr("(n_points + 1) DIV 2") ||
          col("rk") === expr("(n_points + 2) DIV 2"))
      .agg(
        max("n_pairs").as("n_pairs"),
        max("n_points").as("n_periods"),
        floor6(max("slope_med")).as("slope"),
        floor6(avg("r")).as("intercept"))
  }

  // ---------------------------------------------------------------
  // Monthly churn / retention
  // ---------------------------------------------------------------

  /** Monthly customer churn: per month, how many of last month's
    * active customers came back (retained) vs disappeared (churned).
    * One distinct (month, customer) pass over orders, a self-join on
    * the shifted month — both sides pre-aggregated, keyed and
    * co-partitioned on (month, customer) — then integer counts and ONE
    * division per month. Output is month-bounded. */
  def qChurnRate(s: SparkSession, d: String): DataFrame = {
    val am = t(s, d, "orders")
      .select(monthIdx(col("o_orderdate")).as("m"), col("o_custkey"))
      .distinct()
    val active = am.groupBy("m").agg(count(lit(1)).as("active"))
    val prevActive = active
      .select((col("m") + 1).as("m"), col("active").as("active_prev"))
    val retained = am
      .select((col("m") + 1).as("m"), col("o_custkey"))
      .join(am, Seq("m", "o_custkey"))
      .groupBy("m")
      .agg(count(lit(1)).as("retained"))
    active
      .join(prevActive, "m")
      .join(retained, Seq("m"), "left")
      .select(
        col("m").as("month_idx"),
        col("active_prev"),
        col("active"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        (col("active_prev") - coalesce(col("retained"), lit(0L))).as("churned"),
        floor6(
          (col("active_prev") - coalesce(col("retained"), lit(0L)))
            .cast("double") / col("active_prev").cast("double"))
          .as("churn_rate"),
        floor6(
          coalesce(col("retained"), lit(0L)).cast("double") /
            col("active_prev").cast("double")).as("retention_rate"))
      .transform(sortSmall(_, col("month_idx")))
  }

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_welch_ttest" -> qWelchTtest _,
    "q_mann_kendall" -> qMannKendall _,
    "q_theil_sen" -> qTheilSen _,
    "q_churn_rate" -> qChurnRate _
  )

  val oracles: Map[String, String] = Map(
    "q_welch_ttest" ->
      s"""WITH g AS (
         |  SELECT event_type = 'purchase' AS grp,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
         |         sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS sq
         |  FROM events GROUP BY 1),
         |ab AS (
         |  SELECT a.n AS n_a, a.sc AS sc_a, a.sq AS sq_a,
         |         b.n AS n_b, b.sc AS sc_b, b.sq AS sq_b
         |  FROM (SELECT * FROM g WHERE grp) a, (SELECT * FROM g WHERE NOT grp) b),
         |m AS (
         |  SELECT n_a, n_b,
         |         CAST(sc_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 100.0) AS mean_a,
         |         CAST(sc_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 100.0) AS mean_b,
         |         (CAST(sq_a AS DOUBLE) - CAST(sc_a AS DOUBLE) * CAST(sc_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / ((CAST(n_a AS DOUBLE) - 1.0) * 10000.0) AS var_a,
         |         (CAST(sq_b AS DOUBLE) - CAST(sc_b AS DOUBLE) * CAST(sc_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / ((CAST(n_b AS DOUBLE) - 1.0) * 10000.0) AS var_b
         |  FROM ab),
         |se AS (
         |  SELECT *, var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE) AS se2 FROM m)
         |SELECT n_a, n_b,
         |       ${floor6Sql("mean_a")} AS mean_a,
         |       ${floor6Sql("mean_b")} AS mean_b,
         |       ${floor6Sql("(mean_a - mean_b) / sqrt(se2)")} AS t_stat,
         |       ${floor6Sql(
          "se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1.0) + (var_b / n_b) * (var_b / n_b) / (n_b - 1.0))")} AS df
         |FROM se""".stripMargin,
    "q_mann_kendall" ->
      s"""WITH m AS (
         |  SELECT CAST($MonthIdxSql AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |s AS (
         |  SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM m a JOIN m b ON a.m < b.m),
         |ties AS (
         |  SELECT CAST(coalesce(sum(tk * (tk - 1) * (2 * tk + 5)), 0) AS BIGINT) AS tie_term
         |  FROM (SELECT c, count(*) AS tk FROM m GROUP BY 1) t WHERE tk > 1),
         |nn AS (SELECT count(*) AS n_periods FROM m),
         |v AS (
         |  SELECT n_periods, s_stat,
         |         n_periods * (n_periods - 1) * (2 * n_periods + 5) - tie_term AS var18
         |  FROM nn, s, ties),
         |z AS (
         |  SELECT *,
         |         CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |              ELSE 0.0 END AS z_stat
         |  FROM v)
         |SELECT n_periods, s_stat, CAST(var18 AS DOUBLE) / 18.0 AS var_s,
         |       ${floor6Sql("z_stat")} AS z_stat,
         |       CASE WHEN z_stat > $MkCritical THEN 'increasing'
         |            WHEN z_stat < -$MkCritical THEN 'decreasing'
         |            ELSE 'none' END AS trend
         |FROM z""".stripMargin,
    "q_theil_sen" ->
      s"""WITH m AS (
         |  SELECT CAST($MonthIdxSql AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |pairs AS (
         |  SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.m - a.m AS DOUBLE) AS slope,
         |         a.m AS ma, b.m AS mb
         |  FROM m a JOIN m b ON a.m < b.m),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY slope, ma, mb) AS BIGINT) AS rk FROM pairs),
         |cnt AS (SELECT max(rk) AS n_pairs FROM ranked),
         |sm AS (
         |  SELECT avg(slope) AS slope_med, max(n_pairs) AS n_pairs
         |  FROM ranked, cnt
         |  WHERE rk = (n_pairs + 1) // 2 OR rk = (n_pairs + 2) // 2),
         |resid AS (
         |  SELECT n_pairs, slope_med,
         |         CAST(c AS DOUBLE) - slope_med * CAST(m AS DOUBLE) AS r, m
         |  FROM m, sm),
         |rankedr AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY r, m) AS BIGINT) AS rk FROM resid),
         |cntr AS (SELECT max(rk) AS n_points FROM rankedr)
         |SELECT max(n_pairs) AS n_pairs, max(n_points) AS n_periods,
         |       ${floor6Sql("max(slope_med)")} AS slope,
         |       ${floor6Sql("avg(r)")} AS intercept
         |FROM rankedr, cntr
         |WHERE rk = (n_points + 1) // 2 OR rk = (n_points + 2) // 2""".stripMargin,
    "q_churn_rate" ->
      s"""WITH am AS (
         |  SELECT DISTINCT CAST($MonthIdxSql AS BIGINT) AS m, o_custkey FROM orders),
         |active AS (SELECT m, count(*) AS active FROM am GROUP BY 1),
         |prev AS (SELECT m + 1 AS m, active AS active_prev FROM active),
         |ret AS (
         |  SELECT a.m + 1 AS m, count(*) AS retained
         |  FROM am a JOIN am b ON a.m + 1 = b.m AND a.o_custkey = b.o_custkey
         |  GROUP BY 1)
         |SELECT active.m AS month_idx, active_prev, active,
         |       coalesce(retained, 0) AS retained,
         |       active_prev - coalesce(retained, 0) AS churned,
         |       ${floor6Sql(
          "CAST(active_prev - coalesce(retained, 0) AS DOUBLE) / CAST(active_prev AS DOUBLE)")} AS churn_rate,
         |       ${floor6Sql(
          "CAST(coalesce(retained, 0) AS DOUBLE) / CAST(active_prev AS DOUBLE)")} AS retention_rate
         |FROM active JOIN prev ON active.m = prev.m
         |LEFT JOIN ret ON active.m = ret.m
         |ORDER BY month_idx""".stripMargin
  )
}
