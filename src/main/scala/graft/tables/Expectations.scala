package graft.tables

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.conf.GraftSettings
import graft.ext.Parallelism

/** Write-time data-quality expectations (Delta CHECK constraints / DLT
  * expectations): each [[Expectation]] is a named predicate a row must
  * satisfy, with an enforcement action —
  *
  *  - `Warn`: violating rows are still written; only counted.
  *  - `Drop`: violating rows are withheld from the target (and captured
  *    to the quarantine table when one is given, tagged with the names of
  *    every rule they failed — the triage table a 100 TB ingest needs,
  *    because "2% dropped" without the rows is undebuggable).
  *  - `Fail`: ANY violation aborts the whole batch BEFORE a byte reaches
  *    the target table — all-or-nothing, the invariant class (wrong-type
  *    ids, negative prices) where a partial write is worse than an outage.
  *
  * NULL predicate results count as violations (DLT semantics: a row
  * passes only when the predicate is TRUE) — `expectNotNull` is the
  * common case packaged.
  *
  * Scale shape: rules are pure column predicates evaluated in ONE pass
  * over the batch (whole-stage codegen, no UDFs, no shuffle). With no
  * Fail rules and no quarantine, validation costs ZERO extra actions —
  * violation counts ride the append itself via `Dataset.observe`
  * (metrics collected by the write's own job). Fail rules or a
  * quarantine need the batch examined before/twice, so the batch is
  * materialized once (the house multi-consumer discipline) and counts
  * come from one narrow aggregate over the cached partitions — still
  * O(batch), never O(table).
  */
object Expectations {

  sealed trait Action
  object Action {
    /** Count violations, write the rows anyway. */
    case object Warn extends Action
    /** Withhold violating rows from the target (quarantine if capturing). */
    case object Drop extends Action
    /** Abort the batch on any violation; nothing is written. */
    case object Fail extends Action
  }

  final case class Expectation(name: String, predicate: Column, action: Action) {
    require(name.nonEmpty && !name.contains(','),
      s"expectation name '$name' must be non-empty and comma-free")
  }

  def expect(name: String, predicate: Column,
      action: Action = Action.Warn): Expectation =
    Expectation(name, predicate, action)

  /** One Drop rule per column: the row is withheld when the column is
    * NULL — the NOT NULL constraint. */
  def expectNotNull(cols: String*): Seq[Expectation] =
    cols.map(c => Expectation(s"not_null_$c", col(c).isNotNull, Action.Drop))

  /** Per-rule violation counts (every action, including Warn) plus the
    * batch row count. `violations(name) == 0` for a rule nothing broke. */
  final case class Metrics(rows: Long, violations: Map[String, Long]) {
    def violated(name: String): Long = violations.getOrElse(name, 0L)
  }

  /** The column added to quarantined rows: the names of every rule the
    * row failed (Drop AND Warn/Fail rules alike — full triage context). */
  val ViolationsCol = "_violations"

  private def violationsArray(rules: Seq[Expectation]): Column =
    array_compact(array(rules.map(r =>
      when(coalesce(r.predicate, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name))): _*))

  private def countExprs(rules: Seq[Expectation]): Seq[Column] =
    count(lit(1)).as("__rows") +: rules.map(r =>
      sum(when(array_contains(col(ViolationsCol), r.name), 1L).otherwise(0L))
        .as(s"__viol_${r.name}"))

  /** Shared between the Observation map and the aggregate Row: a NULL
    * metric (sum over zero rows) reads as 0. */
  private def metricsFrom(get: String => Option[Any],
      rules: Seq[Expectation]): Metrics =
    Metrics(
      get("__rows").flatMap(Option(_)).fold(0L)(_.asInstanceOf[Long]),
      rules.map(r => r.name ->
        get(s"__viol_${r.name}").flatMap(Option(_)).fold(0L)(_.asInstanceOf[Long]))
        .toMap)

  /** Validate `df` against `rules` and append the surviving rows to
    * `table`. Returns per-rule violation counts. Throws
    * [[ExpectationsFailedException]] (target and quarantine untouched)
    * when a Fail rule is violated. `batchTag`, when given, is stamped on
    * quarantined rows as `_batch` — wire the foreachBatch batchId through
    * it so triage can tie a bad row to its delivery. */
  def appendWithExpectations(
      table: GraftTable,
      df: DataFrame,
      rules: Seq[Expectation],
      quarantine: Option[GraftTable] = None,
      batchTag: Option[String] = None)(
      implicit settings: GraftSettings): Metrics = {
    require(rules.nonEmpty, "appendWithExpectations requires at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate expectation names: ${rules.map(_.name).diff(rules.map(_.name).distinct).mkString(", ")}")
    require(!df.columns.contains(ViolationsCol),
      s"input already carries a $ViolationsCol column")
    // same reserved-name contract as ViolationsCol: the quarantine stamp
    // must never silently overwrite a source column of the same name
    require(batchTag.isEmpty || !df.columns.contains("_batch"),
      "input already carries a _batch column — the quarantine batch tag would overwrite it")
    val tagged = df.withColumn(ViolationsCol, violationsArray(rules))
    val dropNames = rules.collect { case r if r.action == Action.Drop => r.name }
    val failNames = rules.collect { case r if r.action == Action.Fail => r.name }
    val enforced = dropNames ++ failNames
    val keepPred =
      if (enforced.isEmpty) lit(true)
      else !arrays_overlap(col(ViolationsCol), array(enforced.map(lit): _*))
    val ce = countExprs(rules)

    // fast path also when a quarantine is configured but NO rule can ever
    // withhold a row (warn-only): the quarantine is provably empty, so
    // the batch must not pay the materialize + double-pass
    if (failNames.isEmpty && (quarantine.isEmpty || enforced.isEmpty)) {
      // zero-extra-action path: counts ride the append's own job
      val obs = Observation(s"expectations-${UUID.randomUUID()}")
      table.append(
        tagged.observe(obs, ce.head, ce.tail: _*)
          .filter(keepPred).drop(ViolationsCol))
      val m = obs.get
      metricsFrom(m.get, rules)
    } else {
      // fail-gate / quarantine path: one materialization, counts from the
      // cached partitions, NOTHING written until the gate passes
      val cached = Parallelism.materialize(tagged)
      val row = cached.agg(ce.head, ce.tail: _*).head()
      val counts = metricsFrom(k => Option(row.getAs[Any](k)), rules)
      val failedRule = failNames.find(counts.violated(_) > 0)
      failedRule.foreach { r =>
        throw new ExpectationsFailedException(r, counts.violated(r), counts.rows)
      }
      table.append(cached.filter(keepPred).drop(ViolationsCol))
      quarantine.foreach { q =>
        val bad = cached.filter(!keepPred)
        val stamped = batchTag.fold(bad)(t => bad.withColumn("_batch", lit(t)))
        if (stamped.limit(1).count() > 0) q.append(stamped)
      }
      counts
    }
  }

  final class ExpectationsFailedException(val rule: String,
      val violations: Long, val rows: Long)
    extends IllegalStateException(
      s"expectation '$rule' failed for $violations of $rows rows — batch aborted, nothing written")
}
