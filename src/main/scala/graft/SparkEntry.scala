package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-module registries; every entry with an
  * `oracleSql` counterpart is hash-checked against DuckDB by the driver.
  */
object SparkEntry {

  /** Flagship: the real averaging kernel (A1 row stage) over the
    * parquet MS fixture; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ms_a1_row_avg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.MsQueries.queries ++
      graft.queries.BdaQueries.queries ++
      graft.queries.UvwQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.MsQueries.oracleSql ++
      graft.queries.BdaQueries.oracleSql ++
      graft.queries.UvwQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.StreamingQueries.oracleSql
}
