package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

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
/** A computed frame served through the DSv1 relation SPI (the CDF read
  * path): no pushdown — appropriate only for bounded derived frames. */
private[tables] final class DataFrameRelation(
    override val sqlContext: SQLContext,
    df: DataFrame) extends BaseRelation
    with org.apache.spark.sql.sources.TableScan {
  override def schema: StructType = df.schema
  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
}

object GraftSource {
  /** Parse a `timestampAsOf` option value: ISO instant, local datetime
    * (`yyyy-MM-dd HH:mm:ss[.S]`, interpreted in the session time zone,
    * Delta's convention), or bare date. */
  private[tables] def tsMillis(s: String, zone: String): Long = {
    val zid = java.time.ZoneId.of(zone)
    scala.util.Try(java.time.Instant.parse(s)).toOption
      .orElse(scala.util.Try(
        java.time.LocalDateTime.parse(s.replace(" ", "T")).atZone(zid).toInstant).toOption)
      .orElse(scala.util.Try(
        java.time.LocalDate.parse(s).atStartOfDay(zid).toInstant).toOption)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse timestampAsOf '$s' — pass an ISO instant, " +
          "'yyyy-MM-dd HH:mm:ss', or 'yyyy-MM-dd'"))
      .toEpochMilli
  }
}

final class GraftSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path (load(path) / option(\"path\", ...))"))

  private def opt(parameters: Map[String, String], name: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    val table = GraftTable(spark, pathOf(parameters))
    if (opt(parameters, "readChangeFeed").exists(_.toBoolean)) {
      // Delta-parity CDF read: rows + _change_type + _commit_version for
      // the commit range [startingVersion, endingVersion] — both bounds
      // INCLUSIVE, the Delta convention (full feed by default). Served as
      // a TableScan relation — a bounded version range, not a pruned
      // 100 TB scan surface.
      val from = opt(parameters, "startingVersion").map(_.toLong - 1L).getOrElse(0L)
      val to = opt(parameters, "endingVersion").map(_.toLong).getOrElse(Long.MaxValue)
      return new DataFrameRelation(sqlContext, table.readChanges(from, to))
    }
    // Delta-parity time travel: .option("versionAsOf", v) pins the scan;
    // .option("timestampAsOf", ts) resolves to the newest commit at or
    // before ts (instant / local datetime / date, session time zone)
    val asOf = opt(parameters, "versionAsOf").map(_.toLong)
      .orElse(opt(parameters, "timestampAsOf").map(ts =>
        table.versionAt(GraftSource.tsMillis(ts,
          spark.sessionState.conf.sessionLocalTimeZone))))
      .getOrElse(Long.MaxValue)
    // the same HadoopFsRelation readRelation builds — Spark wraps it in a
    // LogicalRelation and FileSourceStrategy plans the pruned scan
    GraftRelation.relation(table, asOf)
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

  // ---- streaming: readStream/writeStream format("graft") ------------------
  // (see GraftStreamSource / GraftStreamSink for the semantics)

  private def wantsCdf(parameters: Map[String, String]): Boolean =
    opt(parameters, "readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    // a user-supplied schema would diverge from the batches getBatch
    // builds (always the log schema) and mis-bind the streaming plan —
    // refuse, as Delta does, rather than half-honor it
    require(schema.isEmpty,
      "graft streaming source manages its own schema (the table log's) — " +
        "drop the .schema(...) call")
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    val table = GraftTable(sqlContext.sparkSession, pathOf(parameters))
    val base = GraftStreamSource.schemaOf(table)
    (shortName(),
      if (wantsCdf(parameters)) GraftCdfStreamSource.cdfSchema(base) else base)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    val table = GraftTable(sqlContext.sparkSession, pathOf(parameters))
    if (wantsCdf(parameters)) new GraftCdfStreamSource(table, parameters)
    else new GraftStreamSource(table, parameters)
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft sink does not partition by columns — cluster/bucket via GraftTable settings")
    GraftStreamSink.requireAppend(outputMode)
    implicit val settings: graft.conf.GraftSettings =
      graft.conf.GraftSettings.default
    new GraftStreamSink(
      GraftTable(sqlContext.sparkSession, pathOf(parameters)),
      GraftStreamSink.keyFrom(parameters, sqlContext.sparkSession))
  }
}
