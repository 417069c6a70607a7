package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.CatalogQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented catalog query (relational inventory + training-data
    * operators), each paired with a DuckDB oracle when SQL-expressible. */
  def catalog: Seq[CatalogQuery] =
    graft.operators.RelationalQueries.all ++
      graft.operators.TextQueries.all ++
      graft.operators.VectorQueries.all ++
      graft.operators.WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
