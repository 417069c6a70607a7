package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

/** `format("graft")` — the storage layer as a REGISTERED Spark data
  * source (DSv1 provider surface, the same registration path Delta's
  * `format("delta")` ships):
  *
  * {{{
  *   spark.read.format("graft").load(path)          // = readRelation()
  *   df.write.format("graft").mode("append").save(path)
  *   spark.sql(s"CREATE TABLE t USING graft LOCATION '\$path'")
  * }}}
  *
  * Reads resolve through [[GraftFileIndex]] (log-schema scan,
  * analysis-time stats pruning, snapshot-pinned). Writes map SaveMode
  * onto the commit protocol: Append → `append` (additive schema
  * evolution), Overwrite → `overwrite`, ErrorIfExists/Ignore per
  * contract. Table options (e.g. bucket/cluster settings) come from the
  * session's GraftSettings default; pipelines needing bespoke settings
  * keep using [[GraftTable]] directly — the provider is the plug-in
  * surface for SQL and generic readers, not a replacement API.
  */
final class GraftSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path (load(path) / option(\"path\", ...))"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    val table = GraftTable(spark, pathOf(parameters))
    // the same HadoopFsRelation readRelation builds — Spark wraps it in a
    // LogicalRelation and FileSourceStrategy plans the pruned scan
    GraftRelation.relation(table)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    val table = GraftTable(spark, pathOf(parameters))
    mode match {
      case SaveMode.Append => table.append(data)
      case SaveMode.Overwrite => table.overwrite(data)
      case SaveMode.ErrorIfExists =>
        if (table.exists) throw new IllegalStateException(
          s"graft table already exists: ${table.path} (SaveMode.ErrorIfExists)")
        table.overwrite(data)
      case SaveMode.Ignore => if (!table.exists) table.overwrite(data)
    }
    createRelation(sqlContext, parameters)
  }
}
