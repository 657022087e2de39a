package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{OlapQueries, PipelineQueries, StatsQueries, StreamQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry implements. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The end-to-end corpus-preparation pipeline — every major
    * subsystem (shingling, dedup clustering, text quality, sampling) in
    * one oracle-checked plan. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.qPipelineE2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StreamQueries.queries ++ OlapQueries.queries ++ PipelineQueries.queries ++
      TpchQueries.queries ++ StatsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_approx_distinct, q_ann_lsh) → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    StreamQueries.oracles ++ OlapQueries.oracles ++ PipelineQueries.oracles ++
      TpchQueries.oracles ++ StatsQueries.oracles
}
