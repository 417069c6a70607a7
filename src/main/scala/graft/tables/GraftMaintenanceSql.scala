package graft.tables

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** Maintenance SQL over graft tables — the Delta statement surface the
  * reference operates through (`DESCRIBE HISTORY` is how it watches
  * curated tables, `jibaro/datalake/cdc.py:224-247`; `VACUUM` is its
  * 768-hour GC cadence, `cdc.py:264-269`; `OPTIMIZE` is the SQL twin of
  * its small-file compaction, `delta_handler.py:9-35`):
  *
  * {{{
  *   VACUUM '/lake/t' [RETAIN 24 HOURS]        -- data-file GC
  *   VACUUM '/lake/t' RETAIN 50 VERSIONS       -- commit-LOG trim (vacuumLog)
  *   OPTIMIZE '/lake/t' [ZORDER BY (c1, c2)]   -- compaction / clustered rewrite
  *   DESCRIBE HISTORY '/lake/t'
  *   RESTORE TABLE '/lake/t' TO VERSION AS OF 3
  *   CONVERT TO GRAFT '/lake/plain_parquet' [NO STATISTICS]
  *   FSCK REPAIR TABLE '/lake/t' [DRY RUN]
  * }}}
  *
  * The target is a quoted path or a catalog table name (`USING graft`).
  * None of these statements exist in vanilla Spark SQL, so the injected
  * parser ([[GraftSqlParser]]) can intercept on the leading keyword
  * without shadowing any built-in; everything else delegates verbatim.
  * Each statement runs through the SAME [[GraftTable]] primitive as the
  * Scala API — one implementation, two surfaces, like the DML rules.
  */
object GraftMaintenanceSql {

  /** A statement target: a filesystem path or a catalog table name,
    * resolved lazily at RUN time (catalog state may change between parse
    * and execution — Delta resolves the same way). */
  sealed trait Target { def resolve(spark: SparkSession): GraftTable }

  final case class PathTarget(path: String) extends Target {
    override def resolve(spark: SparkSession): GraftTable =
      GraftTable(spark, path)(graft.conf.GraftSettings.default)
  }

  final case class IdentTarget(parts: Seq[String]) extends Target {
    override def resolve(spark: SparkSession): GraftTable = {
      val catalog = spark.sessionState.catalog
      val ident = parts match {
        case Seq(t)     => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => throw new IllegalArgumentException(
          s"cannot resolve ${parts.mkString(".")} — use db.table or a quoted path")
      }
      val meta = catalog.getTableMetadata(ident)
      require(meta.provider.exists(_.equalsIgnoreCase("graft")),
        s"${parts.mkString(".")} is not a graft table " +
          s"(provider: ${meta.provider.getOrElse("none")})")
      val loc = meta.storage.locationUri.getOrElse(throw new IllegalStateException(
        s"graft table ${parts.mkString(".")} has no location"))
      GraftTable(spark, loc.toString)(graft.conf.GraftSettings.default)
    }
  }
}

import GraftMaintenanceSql._

/** `VACUUM t [RETAIN h HOURS]` — data-file GC past retention; returns one
  * row per deleted file (Delta prints the touched paths the same way). */
final case class GraftVacuumCommand(target: Target,
    retainHours: Option[Double]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    retainHours.fold(t.vacuum())(t.vacuum(_)).map(Row(_))
  }
}

/** `VACUUM t RETAIN n VERSIONS` — commit-LOG trim ([[GraftTable.vacuumLog]],
  * the Delta `logRetentionDuration` twin, counted in versions). */
final case class GraftVacuumLogCommand(target: Target,
    retainVersions: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    target.resolve(spark).vacuumLog(retainVersions).map(Row(_))
}

/** `OPTIMIZE t [ZORDER BY (cols)]` — [[GraftTable.optimize]]: bin-packs
  * only the sub-target-size files (Delta semantics — already-compact
  * files are never rewritten, so the statement stays O(small tail) at
  * scale); ZORDER BY is the global clustered rewrite so data skipping on
  * those columns stays selective. */
final case class GraftOptimizeCommand(target: Target,
    zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("numFilesBefore", LongType, nullable = false)(),
    AttributeReference("numFilesAfter", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = target.resolve(spark)
    val before = t.liveFiles().size.toLong
    t.optimize(zorderBy)
    Seq(Row(before, t.liveFiles().size.toLong))
  }
}

/** `DESCRIBE HISTORY t` — the commit log as rows (the reference's
  * monitoring read, `cdc.py:224-247`). Bounded by the (checkpoint-trimmed)
  * log, a metadata-plane collect. */
final case class GraftDescribeHistoryCommand(target: Target)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("dataChange", BooleanType, nullable = false)(),
    AttributeReference("numAddedFiles", LongType, nullable = false)(),
    AttributeReference("operationMetrics", MapType(StringType, StringType))(),
    AttributeReference("numFiles", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    target.resolve(spark).history().collect().toSeq
}

/** `RESTORE TABLE t TO VERSION AS OF v` — rolls the live set back as a NEW
  * commit ([[GraftTable.restore]]; history is never rewritten). */
final case class GraftRestoreCommand(target: Target,
    version: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restoredVersion", LongType, nullable = false)(),
    AttributeReference("commitVersion", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val c = target.resolve(spark).restore(version)
    Seq(Row(version, c.version))
  }
}

/** `CONVERT TO GRAFT 'path' [NO STATISTICS]` — adopt an existing parquet
  * directory in place ([[GraftTable.convert]]; Delta's CONVERT TO DELTA:
  * one stats scan, zero rewrites). */
final case class GraftConvertCommand(target: Target,
    withStats: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("numConvertedFiles", LongType, nullable = false)(),
    AttributeReference("numConvertedBytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // unlike the other statements, the catalog-table form targets a table
    // that is NOT graft yet: a `USING parquet` table converts in place and
    // its catalog provider flips to graft (Delta's CONVERT does the same)
    val table = target match {
      case PathTarget(p) =>
        GraftTable(spark, p)(graft.conf.GraftSettings.default)
      case IdentTarget(parts) =>
        val catalog = spark.sessionState.catalog
        val ident = parts match {
          case Seq(t)     => TableIdentifier(t)
          case Seq(db, t) => TableIdentifier(t, Some(db))
          case _ => throw new IllegalArgumentException(
            s"cannot resolve ${parts.mkString(".")} — use db.table or a quoted path")
        }
        val meta = catalog.getTableMetadata(ident)
        require(meta.provider.exists(_.equalsIgnoreCase("parquet")),
          s"CONVERT TO GRAFT needs a parquet table or a path, " +
            s"got provider ${meta.provider.getOrElse("none")}")
        val loc = meta.storage.locationUri.getOrElse(throw new IllegalStateException(
          s"table ${parts.mkString(".")} has no location"))
        GraftTable(spark, loc.toString)(graft.conf.GraftSettings.default)
    }
    val c = table.convert(collectStats = withStats)
    // flip the provider only AFTER the convert commit landed — a failed
    // convert must not leave the catalog claiming graft over bare parquet
    target match {
      case IdentTarget(parts) =>
        val catalog = spark.sessionState.catalog
        val ident = parts match {
          case Seq(t)     => TableIdentifier(t)
          case Seq(db, t) => TableIdentifier(t, Some(db))
          case _          => throw new IllegalStateException("unreachable")
        }
        catalog.alterTable(catalog.getTableMetadata(ident).copy(provider = Some("graft")))
        catalog.refreshTable(ident)
      case _ => ()
    }
    Seq(Row(c.metrics("numConvertedFiles").toLong,
      c.metrics("numConvertedBytes").toLong))
  }
}

/** `FSCK REPAIR TABLE t [DRY RUN]` — [[GraftTable.repair]]: drop log
  * references to data files missing on disk (one listing reconciliation);
  * DRY RUN reports without committing. */
final case class GraftFsckCommand(target: Target,
    dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    target.resolve(spark).repair(dryRun).map(Row(_))
}

/** The injected parser: recognizes the graft maintenance statements and
  * delegates EVERYTHING else (including all non-plan parse entry points)
  * to Spark's own parser. Regex-matched rather than a grammar — the
  * statements are keyword-anchored, and for the keywords no vanilla
  * statement can start with (VACUUM/OPTIMIZE/RESTORE/CONVERT TO GRAFT) a
  * grammar miss raises a usage error instead of a misleading delegate
  * parse error. Known accepted collision, same as Delta's grammar:
  * `DESCRIBE history c` (column c of a table literally named "history")
  * parses as DESCRIBE HISTORY of table c. */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // target = 'quoted path' | `backticked` | bare (possibly dotted) name
  private val T = """('[^']*'|`[^`]+`|[\w.$]+)"""
  private val Vacuum: Regex =
    s"""(?is)\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS)?\\s*;?\\s*""".r
  private val VacuumLog: Regex =
    s"""(?is)\\s*VACUUM\\s+$T\\s+RETAIN\\s+(\\d+)\\s+VERSIONS\\s*;?\\s*""".r
  private val Optimize: Regex =
    s"""(?is)\\s*OPTIMIZE\\s+$T(?:\\s+ZORDER\\s+BY\\s+\\(?([^();]+?)\\)?)?\\s*;?\\s*""".r
  private val History: Regex =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*""".r
  private val Restore: Regex =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val Convert: Regex =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+$T(\\s+NO\\s+STATISTICS)?\\s*;?\\s*""".r
  private val Fsck: Regex =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$T(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  // DESC[RIBE] HISTORY is deliberately absent: `DESCRIBE history` is valid
  // vanilla SQL on a table named "history", so an unmatched describe always
  // delegates; the other keywords can never start a vanilla statement
  private val Keyword: Regex =
    """(?is)\s*(VACUUM|OPTIMIZE|RESTORE|CONVERT\s+TO\s+GRAFT|FSCK)\b.*""".r

  private def target(s: String): Target =
    if (s.startsWith("'")) PathTarget(s.substring(1, s.length - 1))
    else IdentTarget(delegate.parseMultipartIdentifier(s))

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case VacuumLog(t, n)  => GraftVacuumLogCommand(target(t), n.toInt)
    case Vacuum(t, h)     => GraftVacuumCommand(target(t), Option(h).map(_.toDouble))
    case Optimize(t, z)   => GraftOptimizeCommand(target(t),
      Option(z).toSeq.flatMap(_.split(',')).map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty))
    case History(t)       => GraftDescribeHistoryCommand(target(t))
    case Restore(t, v)    => GraftRestoreCommand(target(t), v.toLong)
    case Convert(t, noSt) => GraftConvertCommand(target(t), withStats = noSt == null)
    case Fsck(t, dry)     => GraftFsckCommand(target(t), dryRun = dry != null)
    case Keyword(kw)      => throw new IllegalArgumentException(
      s"cannot parse graft ${kw.toUpperCase} statement — usage: " +
        "VACUUM <t> [RETAIN n HOURS | RETAIN n VERSIONS] | " +
        "OPTIMIZE <t> [ZORDER BY (c1, c2)] | DESCRIBE HISTORY <t> | " +
        "RESTORE [TABLE] <t> [TO] VERSION AS OF n | " +
        "CONVERT TO GRAFT <t> [NO STATISTICS] | " +
        "FSCK REPAIR TABLE <t> [DRY RUN]  (t = 'path' or table name)")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
