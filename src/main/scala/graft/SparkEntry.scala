package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain query registries. Every implemented operator
  * from SURVEY.md §2 appears as one `queries` entry; SQL-expressible ones
  * also carry a DuckDB oracle in `oracleSql` (same column names on both
  * sides — the driver hashes after sorting columns by name).
  */
object SparkEntry {

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.RelationalQueries.queries, graft.queries.RelationalQueries.oracleSql),
      (graft.queries.GridQueries.queries, graft.queries.GridQueries.oracleSql),
      (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracleSql),
      (graft.queries.WebQueries.queries, graft.queries.WebQueries.oracleSql),
      (graft.queries.GraphQueries.queries, graft.queries.GraphQueries.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_multi_grid_align")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
