package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage inventory (one entry per implemented
  * operator family from SURVEY §2); `oracleSql` gives the DuckDB-equivalent
  * SQL for the driver's correctness gate. Column names and types are aligned
  * on both sides; every query is deterministically ordered.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.ParityQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.ModelQueries.queries ++
      graft.queries.StatsQueries.queries ++
      graft.queries.TpchQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalOracles.oracleSql ++
      graft.queries.PipelineOracles.oracleSql ++
      graft.queries.ExtendedOracles.oracleSql ++
      graft.queries.ParityOracles.oracleSql ++
      graft.queries.ScaleOracles.oracleSql ++
      graft.queries.QualityOracles.oracleSql ++
      graft.queries.CurationOracles.oracleSql ++
      graft.queries.AnalyticsOracles.oracleSql ++
      graft.queries.ModelOracles.oracleSql ++
      graft.queries.StatsOracles.oracleSql ++
      graft.queries.TpchOracles.oracleSql
}
