package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{EventQueries, MartQueries, PipelineQueries, RelationalQueries, SilverQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All gate-checked queries live as `QueryDef`s (name, Spark fn,
  * optional DuckDB oracle) in [[graft.queries.RelationalQueries]]
  * (row-level + relational ops), [[graft.queries.MartQueries]] (gold
  * marts + serving surface) and [[graft.queries.PipelineQueries]]
  * (LLM-training-data ops over documents/embeddings). This object just
  * flattens them into the driver's Map contract.
  */
object SparkEntry {

  private def allDefs =
    RelationalQueries.defs ++ MartQueries.defs ++ PipelineQueries.defs ++
      SilverQueries.defs ++ EventQueries.defs ++ StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * G1 daily market summary — the reference's headline mart.
    */
  def entry(spark: SparkSession): DataFrame = {
    Engine.configure(spark)
    queries("g01_daily_market_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hash outputs) → driver records rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
