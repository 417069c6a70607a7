package graft.tables

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.TimestampType

/** SQL DML over graft tables — `DELETE FROM` / `UPDATE` / `MERGE INTO` /
  * `SELECT ... VERSION AS OF`, the surface Delta exposes on its tables
  * (the reference's core apply IS the Delta MERGE, `jibaro/datalake/
  * cdc.py:203-217`; a SQL-first user reaches for these before any API).
  *
  * Architecture — the Delta pattern, not DSv2 row-level plumbing: Spark's
  * parser already produces `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` and resolves their condition/assignment expressions
  * against the target relation; an injected analyzer rule
  * ([[GraftDmlRule]]) then swaps the resolved node for a runnable command
  * that executes through the SAME [[GraftTable]] primitives the Scala API
  * uses (`deleteImpl`/`updateImpl`/`replaceWith`), so both surfaces share
  * one implementation: stats/bucket file pruning, CDF recording rules,
  * and [[GraftTable]]'s logical conflict detection all apply identically.
  *
  * Scale shape: DELETE/UPDATE extract skipping atoms from the ANALYZED
  * Catalyst condition ([[ExpressionAtoms]]) so a selective SQL DELETE
  * rewrites O(matching files), exactly like the API path. MERGE rewrites
  * the whole table (its scope is the full join); keyed CDC flows that
  * need O(batch) merges use the bucketed `upsert` — the SQL MERGE is the
  * ANSI-semantics surface, priced like Delta's un-pruned merge.
  */
object GraftDml {

  /** The [[GraftFileIndex]] behind a resolved DML target, unwrapped
    * through whatever aliases the analyzer added. None = not a graft
    * table, leave the plan for Spark's own (v2) handling. */
  private[tables] def graftIndexOf(plan: LogicalPlan): Option[GraftFileIndex] =
    plan.collectFirst {
      case lr: LogicalRelation => lr.relation
    }.collect {
      case fs: HadoopFsRelation => fs.location
    }.collect {
      case idx: GraftFileIndex => idx
    }

  /** The catalog identifier behind a resolved DML target, when it IS a
    * catalog table (None for path loads). A DML that creates deletion
    * vectors or re-binds them changes state the cached relation's FILE
    * FORMAT was built from — `index.refresh()` re-pins the file list but
    * not the format — so the command must drop the catalog's cached plan
    * and let the next query re-resolve with the right format. */
  private[tables] def tableIdentOf(plan: LogicalPlan): Option[TableIdentifier] =
    plan.collectFirst {
      case lr: LogicalRelation if lr.catalogTable.isDefined =>
        lr.catalogTable.get.identifier
    }

  private[tables] def refreshCatalog(spark: SparkSession,
      ident: Option[TableIdentifier]): Unit =
    ident.foreach(spark.sessionState.catalog.refreshTable)

  /** Re-target a resolved condition at a FRESH scan by name: the command
    * applies it to DataFrames it builds itself (the pruned parquet read
    * inside delete/update), whose attribute ids differ from the analyzed
    * plan's. Correlated subqueries cannot be re-bound this way — refused
    * loudly. */
  private[tables] def byName(e: Expression, op: String): Column = {
    e.foreach {
      case _: SubqueryExpression => throw new UnsupportedOperationException(
        s"graft $op does not support subqueries in conditions — " +
          "materialize the subquery into a source table and MERGE instead")
      case _ => ()
    }
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })
  }
}

/** `DELETE FROM t WHERE p` — the same pruned-rewrite as
  * [[GraftTable.delete]]: only files whose stats admit matching rows are
  * rewritten. */
final case class GraftDeleteCommand(index: GraftFileIndex,
    condition: Expression,
    catalogIdent: Option[TableIdentifier] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    index.table.deleteImpl(
      GraftDml.byName(condition, "DELETE"),
      ExpressionAtoms.conjuncts(condition))
    index.refresh()
    GraftDml.refreshCatalog(spark, catalogIdent)
    Seq.empty
  }
}

/** `UPDATE t SET c = v WHERE p` — the pruned rewrite of
  * [[GraftTable.update]]. Top-level column assignments only (nested
  * struct-field updates are refused loudly). */
final case class GraftUpdateCommand(index: GraftFileIndex,
    assignments: Seq[Assignment],
    condition: Option[Expression],
    catalogIdent: Option[TableIdentifier] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val assigns = assignments.map { a =>
      a.key match {
        case k: AttributeReference => k.name -> GraftDml.byName(a.value, "UPDATE")
        case other => throw new UnsupportedOperationException(
          s"graft UPDATE supports top-level column assignments only, got: $other")
      }
    }.toMap
    val cond = condition.map(GraftDml.byName(_, "UPDATE")).getOrElse(lit(true))
    val atoms = condition.map(ExpressionAtoms.conjuncts).getOrElse(Seq(PredOpaque))
    index.table.updateImpl(cond, atoms, assigns)
    index.refresh()
    GraftDml.refreshCatalog(spark, catalogIdent)
    Seq.empty
  }
}

/** `MERGE INTO target USING source ON cond WHEN ...` with ANSI/Delta
  * semantics:
  *
  *  - matched actions apply FIRST-CLAUSE-WINS in declaration order
  *    (each clause's extra condition gates it); a matched target row no
  *    clause claims is carried through unchanged;
  *  - `WHEN NOT MATCHED [BY TARGET]` inserts source rows the join missed;
  *  - `WHEN NOT MATCHED BY SOURCE` updates/deletes target rows with no
  *    source match;
  *  - a target row matching MULTIPLE source rows fails loudly (the ANSI
  *    cardinality rule Delta enforces) whenever matched actions exist.
  *
  * The captured ANALYZED target/source plans are evaluated via
  * [[PlanBridge.ofRows]], preserving attribute ids so the user's ON
  * condition and action expressions bind as-is over the full-outer join.
  * The final state commits through [[GraftTable.replaceWith]] — one
  * commit, [[GraftTable]] conflict detection included. */
final case class GraftMergeCommand(merge: MergeIntoTable,
    index: GraftFileIndex,
    catalogIdent: Option[TableIdentifier] = None) extends LeafRunnableCommand {

  private val TMark = "__graft_t"
  private val SMark = "__graft_s"
  private val TId = "__graft_tid"

  override def run(spark: SparkSession): Seq[Row] = {
    if (merge.withSchemaEvolution) throw new UnsupportedOperationException(
      "graft MERGE does not support WITH SCHEMA EVOLUTION yet — append the " +
        "new columns first (additive evolution), then MERGE")
    val table = index.table
    val snap = index.pinnedSnapshot
    val targetCols = merge.targetTable.output
    merge.targetTable.schema.fieldNames.foreach { n =>
      require(n != TMark && n != SMark && n != TId, s"column name '$n' is reserved")
    }

    val target = PlanBridge.ofRows(spark, merge.targetTable)
      .withColumn(TId, monotonically_increasing_id())
      .withColumn(TMark, lit(true))
    val source = PlanBridge.ofRows(spark, merge.sourceTable)
      .withColumn(SMark, lit(true))
    val joined = target
      .join(source, ColumnBridge.column(merge.mergeCondition), "full_outer")
      .localCheckpoint(true) // consumed once per WHEN clause + leftovers

    val matched = joined.filter(col(TMark) && col(SMark))
    val sourceOnly = joined.filter(col(SMark) && col(TMark).isNull)
    val targetOnly = joined.filter(col(TMark) && col(SMark).isNull)

    // ANSI cardinality: with matched actions, a target row may match at
    // most one source row — a silent fan-out would apply one row's update
    // and drop the rest nondeterministically
    if (merge.matchedActions.nonEmpty &&
      matched.groupBy(TId).count().filter(col("count") > 1).limit(1).count() > 0)
      throw new IllegalStateException(
        "MERGE: a target row matched multiple source rows — deduplicate the " +
          "source (e.g. Dedup.latestPerKey) or tighten the ON condition")

    def gate(c: Option[Expression]): Column =
      c.map(e => coalesce(ColumnBridge.column(e), lit(false))).getOrElse(lit(true))
    def notPrior(prior: Seq[Option[Expression]]): Column =
      prior.foldLeft(lit(true))((acc, p) => acc && !gate(p))

    /** Project a clause's output in the TARGET schema: assigned columns
      * take their expression, the rest keep the target value (updates) or
      * NULL (inserts). */
    def projected(rows: DataFrame, assigns: Seq[Assignment],
        forInsert: Boolean): DataFrame = {
      val byKey: Map[String, Expression] = assigns.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> a.value
          case other => throw new UnsupportedOperationException(
            s"graft MERGE supports top-level column assignments only, got: $other")
        }
      }.toMap
      rows.select(targetCols.map { a =>
        byKey.get(a.name) match {
          case Some(v) => ColumnBridge.column(v).cast(a.dataType).as(a.name)
          case None if forInsert => lit(null).cast(a.dataType).as(a.name)
          case None => ColumnBridge.column(a).as(a.name)
        }
      }: _*)
    }

    def chain(rows: DataFrame, actions: Seq[MergeAction],
        keepUnclaimed: Boolean, forInsert: Boolean): Seq[DataFrame] = {
      var prior = Seq.empty[Option[Expression]]
      val outs = actions.flatMap { act =>
        val mine = rows.filter(gate(act.condition) && notPrior(prior))
        prior :+= act.condition
        act match {
          case UpdateAction(_, assigns, _) => Some(projected(mine, assigns, forInsert = false))
          case InsertAction(_, assigns)    => Some(projected(mine, assigns, forInsert = forInsert))
          case _: DeleteAction          => None // contributes nothing
          case other => throw new UnsupportedOperationException(
            s"unsupported MERGE action: $other")
        }
      }
      val leftover =
        if (keepUnclaimed)
          Seq(rows.filter(notPrior(prior))
            .select(targetCols.map(a => ColumnBridge.column(a).as(a.name)): _*))
        else Seq.empty
      outs ++ leftover
    }

    val pieces =
      chain(matched, merge.matchedActions, keepUnclaimed = true, forInsert = false) ++
        chain(sourceOnly, merge.notMatchedActions, keepUnclaimed = false, forInsert = true) ++
        chain(targetOnly, merge.notMatchedBySourceActions, keepUnclaimed = true, forInsert = false)
    val merged = pieces.reduce(_.unionByName(_))

    table.replaceWith("merge", snap.version, snap.live, merged,
      Map("mergeClauses" -> (merge.matchedActions.size + merge.notMatchedActions.size +
        merge.notMatchedBySourceActions.size).toString))
    index.refresh()
    GraftDml.refreshCatalog(spark, catalogIdent)
    Seq.empty
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE` a graft catalog table — routed
  * through the COMMIT PROTOCOL. Without this interception Spark's
  * `InsertIntoHadoopFsRelationCommand` (planned for any HadoopFsRelation,
  * which the native graft relation is) would write parquet files straight
  * into the table directory BEHIND the log — invisible orphans on append,
  * and overwrite mode clears the directory, log included: silent table
  * destruction. The command's query arrives already coerced to the table
  * schema (by-position with casts, Spark's insert contract); columns are
  * re-labeled to the table's names before the commit. */
final case class GraftInsertCommand(index: GraftFileIndex,
    query: LogicalPlan, columnNames: Seq[String],
    overwrite: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val df = PlanBridge.ofRows(spark, query).toDF(columnNames: _*)
    if (overwrite) index.table.overwrite(df) else index.table.append(df)
    index.refresh()
    Seq.empty
  }
}

/** The analyzer rule (injected post-hoc via [[graft.GraftExtensions]])
  * that swaps Spark's resolved DML plans over graft targets for the
  * commands above. Non-graft targets pass through untouched. */
final class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // runs AFTER the built-in DataSourceAnalysis in the same post-hoc
    // batch, so inserts arrive as the already-planned file-write command
    case i: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      require(i.staticPartitions.isEmpty && i.partitionColumns.isEmpty,
        "graft tables do not use hive-style partitions — cluster/bucket " +
          "via GraftTable settings instead")
      GraftInsertCommand(i.fileIndex.get.asInstanceOf[GraftFileIndex],
        i.query, i.outputColumns.map(_.name),
        overwrite = i.mode == org.apache.spark.sql.SaveMode.Overwrite)
    case d @ DeleteFromTable(target, condition) if d.resolved =>
      GraftDml.graftIndexOf(target)
        .map(GraftDeleteCommand(_, condition,
          GraftDml.tableIdentOf(target)): LogicalPlan).getOrElse(d)
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      GraftDml.graftIndexOf(target)
        .map(GraftUpdateCommand(_, assignments, condition,
          GraftDml.tableIdentOf(target)): LogicalPlan).getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      GraftDml.graftIndexOf(m.targetTable)
        .map(GraftMergeCommand(m, _,
          GraftDml.tableIdentOf(m.targetTable)): LogicalPlan).getOrElse(m)
    case other => other
  }
}

/** Resolution rule for ANSI time travel over graft catalog tables:
  * `SELECT ... FROM t VERSION AS OF 3` / `TIMESTAMP AS OF '...'` resolves
  * to the snapshot-pinned relation (`versionAsOf` reader-option twin).
  * A timestamp resolves to the newest commit at or before it, Delta's
  * convention. Non-graft relations pass through to Spark's own (v2)
  * time-travel handling. */
final class GraftTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTableOf(nameParts: Seq[String]): Option[GraftTable] = {
    val catalog = spark.sessionState.catalog
    val ident = nameParts match {
      case Seq(t)     => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _          => return None
    }
    if (!catalog.tableExists(ident)) return None
    val meta = catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) return None
    meta.storage.locationUri.map(loc =>
      GraftTable(spark, loc.toString)(graft.conf.GraftSettings.default))
  }

  private def versionFor(table: GraftTable, ts: Option[Expression],
      version: Option[String]): Long = version.map(_.toLong).getOrElse {
    val expr = ts.getOrElse(throw new IllegalArgumentException(
      "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val micros = Cast(expr, TimestampType, Some(zone)).eval(null)
    require(micros != null, s"cannot evaluate TIMESTAMP AS OF $expr")
    table.versionAt(micros.asInstanceOf[Long] / 1000L)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      graftTableOf(u.multipartIdentifier).map { table =>
        val v = versionFor(table, ts, version)
        SubqueryAlias(u.multipartIdentifier.last,
          PlanBridge.ofRows(spark, // analyzed LogicalRelation of the pinned scan
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
              .baseRelationToDataFrame(GraftRelation.relation(table, v))
              .queryExecution.analyzed).queryExecution.logical)
      }.getOrElse(tt)
  }
}
