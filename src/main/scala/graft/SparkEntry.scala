package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QuerySpec

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered operator demonstrations. */
  def specs: Seq[QuerySpec] =
    graft.queries.Relational.specs ++
      graft.queries.CubeQueries.specs ++
      graft.queries.PipelineQueries.specs ++
      graft.queries.ExtraQueries.specs ++
      graft.queries.AnalyticsQueries.specs ++
      graft.queries.SketchQueries.specs ++
      graft.queries.LmQueries.specs ++
      graft.queries.StatQueries.specs ++
      graft.queries.ClusterQueries.specs ++
      graft.queries.TpchQueries.specs ++
      graft.queries.ScaleOpsQueries.specs ++
      graft.queries.EngineQueries.specs

  /** Flagship query (zonal time series, SURVEY §3.2/§7.2) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cube_ts_zonal")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
