package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.conf.GraftSettings
import graft.ext.{Failpoints, Parallelism}

/** Incrementally-maintained grouped aggregate over a [[GraftTable]]'s
  * change feed — the materialized-view maintenance primitive (Delta Live
  * Tables' aggregate flow, Materialize's arrangement): a derived
  * `GROUP BY keyCols` table of `count(*)` + exact `sum(c)` (and, for
  * insert-only feeds, `min(c)`/`max(c)`) kept fresh WITHOUT ever
  * re-scanning the source.
  *
  * Each [[refresh]] reads only the change rows of the unprocessed commit
  * range ([[GraftTable.readChanges]] — inserts/postimages count +1,
  * deletes/preimages −1), folds them to one signed delta row per touched
  * key, and APPENDS that delta batch. [[read]] folds base + deltas back
  * together, dropping keys whose live count reached zero. Per-refresh cost
  * is O(changed rows), read cost is O(keys + deltas-since-consolidation),
  * and [[consolidate]] periodically collapses the store back to one row
  * per live key — at 100 TB the aggregate stays seconds-fresh for the
  * price of the day's delta, where a recompute would re-shuffle the whole
  * fact table per refresh.
  *
  * Sums are folded in DECIMAL (source values frozen to (28,6) micros, the
  * d19 integer-micro discipline) so retraction is EXACT — a float sum that
  * subtracts what it once added drifts by reassociation, and a maintained
  * view that slowly diverges from its recompute twin is worse than no
  * view. Overflow throws (ANSI decimal), never wraps.
  *
  * min/max are only half-maintainable: a delete can retract the current
  * extreme, which no per-range fold can repair without the source. With
  * `minMaxCols` set, a refresh whose change range contains ANY retraction
  * (delete / update_preimage) refuses loudly rather than serve a maybe-
  * stale extreme.
  *
  * Replay contract (the [[graft.ext.LexIndex]]/AnnIndex ordering): the
  * cursor row (token, from_v, to_v, n_rows) is committed BEFORE the delta
  * batch, and every refresh first HEALS — if the top cursor row promises
  * n_rows > 0 but its token is absent from the delta store, the crashed
  * range is recomputed from the (immutable) commit log and appended under
  * the same token. A completed refresh re-appends nothing; a crashed one
  * fills exactly its gap; delta ranges are never applied twice because the
  * cursor row is what advances `from_v`.
  *
  * DML on the source (upsert/delete/update) must run with
  * `settings.changeDataFeed` enabled — [[GraftTable.readChanges]] refuses
  * rewrite commits without recorded change rows rather than invent them.
  */
final class IncrementalAgg(
    spark: SparkSession,
    val path: String,
    source: GraftTable,
    keyCols: Seq[String],
    sumCols: Seq[String] = Seq.empty,
    minMaxCols: Seq[String] = Seq.empty)(implicit settings: GraftSettings) {
  import spark.implicits._

  require(keyCols.nonEmpty, "IncrementalAgg requires key columns")
  private val derived =
    Seq("cnt", "token") ++ sumCols.map(sumName) ++
      minMaxCols.flatMap(c => Seq(minName(c), maxName(c)))
  require(keyCols.intersect(derived).isEmpty,
    s"key columns ${keyCols.intersect(derived).mkString(", ")} collide with " +
      "the aggregate's own output columns (cnt/token/sum_*/min_*/max_*)")

  private[tables] val deltasTable = GraftTable(spark, s"$path/deltas")
  private[tables] val appliedTable = GraftTable(spark, s"$path/applied")
  private[graft] val failpoints = new Failpoints

  private def sumName(c: String) = s"sum_$c"
  private def minName(c: String) = s"min_$c"
  private def maxName(c: String) = s"max_$c"
  private val dec = DecimalType(28, 6)

  /** The top cursor row by (to_v, from_v) — ONE collect serves both the
    * cursor (its to_v IS max(to_v)) and heal's promised-range check, so a
    * refresh pays one applied-store job, not two. */
  private def topCursorRow(): Option[(String, Long, Long, Long)] =
    if (!appliedTable.exists) None
    else appliedTable.read().orderBy(col("to_v").desc, col("from_v").desc)
      .limit(1).collect().headOption
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("from_v"),
        r.getAs[Long]("to_v"), r.getAs[Long]("n_rows")))

  /** Highest source version whose changes are (promised) applied. */
  def cursor: Long = topCursorRow().map(_._3).getOrElse(0L)

  /** Fold a change-shaped frame (table columns + `_change_type`) to one
    * signed delta row per touched key. Deterministic, so a healed replay
    * reproduces the crashed append byte-for-byte in content. */
  private def deltaFrameOf(ch: DataFrame): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val signedSum = (c: String) =>
      sum(when(sign === 1L, col(c).cast(dec)).otherwise(-col(c).cast(dec)))
        .as(sumName(c))
    val aggs: Seq[Column] =
      Seq(sum(sign).as("cnt")) ++ sumCols.map(signedSum) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(minName(c)), max(col(c)).as(maxName(c))))
    ch.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def deltaFrame(fromExclusive: Long, toInclusive: Long): DataFrame = {
    val ch = source.readChanges(fromExclusive, toInclusive)
    if (minMaxCols.nonEmpty) {
      // one retraction poisons every min/max in the range — check the
      // bounded change frame, not the table
      val retractions = ch
        .filter(col("_change_type").isin("delete", "update_preimage"))
        .limit(1).count()
      if (retractions > 0)
        throw new IllegalStateException(
          s"change range ($fromExclusive, $toInclusive] of $path contains " +
            "deletes/updates — min/max cannot be maintained incrementally " +
            "under retraction; drop minMaxCols or recompute from the source")
    }
    deltaFrameOf(ch)
  }

  /** Fill the gap a crash between the cursor append and the delta append
    * left: the top cursor row promises n_rows delta rows under its token.
    * Takes the already-collected top row — from_v DESC in [[topCursorRow]]
    * breaks the tie between a consolidate marker (from == to) and the real
    * range ending at the same version (from < to): the marker must win, or
    * heal would chase the range token the consolidation overwrite just
    * absorbed. */
  private def heal(top: Option[(String, Long, Long, Long)]): Unit =
    top.foreach { case (token, fromV, toV, nRows) =>
      val missing = nRows > 0 && (!deltasTable.exists ||
        deltasTable.read().filter(col("token") === token).limit(1).count() == 0)
      if (missing)
        deltasTable.append(deltaFrame(fromV, toV).withColumn("token", lit(token)))
    }

  private def heal(): Unit = heal(topCursorRow())

  /** Process the source commits in (cursor, source.version] and return the
    * new cursor. Idempotent under at-least-once invocation (see the class
    * note); a refresh with nothing new is a no-op. */
  def refresh(): Long = {
    val top = topCursorRow()
    heal(top)
    val v0 = top.map(_._3).getOrElse(0L)
    val v1 = if (source.exists) source.version else 0L
    if (v1 <= v0) return v0
    // materialized: the row count below and the append must not run the
    // change-feed fold twice
    val d = Parallelism.materialize(deltaFrame(v0, v1))
    val n = d.count()
    val token = s"cdf-$v1"
    // cursor BEFORE deltas (the shared index ordering): the crash window
    // in between is exactly what heal() closes
    appliedTable.append(Seq((token, v0, v1, n)).toDF("token", "from_v", "to_v", "n_rows"))
    failpoints.hit("after-cursor")
    if (n > 0) deltasTable.append(d.withColumn("token", lit(token)))
    // cursor rows are one-per-refresh; delta compaction merges FILES only
    // (consolidate() is what merges rows)
    appliedTable.compactIfNeeded()
    deltasTable.compactIfNeeded()
    v1
  }

  private def fold(deltas: DataFrame): DataFrame = {
    val aggs: Seq[Column] =
      Seq(sum(col("cnt")).as("cnt")) ++
        sumCols.map(c => sum(col(sumName(c))).as(sumName(c))) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(minName(c))).as(minName(c)),
            max(col(maxName(c))).as(maxName(c))))
    deltas.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("cnt") > 0)
  }

  /** The maintained aggregate: (keys..., cnt, sum_<c>..., min/max_<c>...).
    * Keys whose live count is zero are absent, exactly as a recompute
    * would have them. */
  def read(): DataFrame =
    if (deltasTable.exists) fold(deltasTable.read().drop("token"))
    else
      // never refreshed (or every range was empty): the empty aggregate in
      // the same shape, derived from the source schema
      fold(deltaFrameOf(
        source.read().limit(0).withColumn("_change_type", lit("insert"))))

  /** Collapse the delta store to one row per LIVE key (zero-count keys
    * drop out) so read cost stays O(keys) across thousands of refreshes.
    * The folded rows keep the TOP cursor token — their content includes
    * that range's deltas, so heal() still sees the promise kept. Run at a
    * quiet cadence, like every store's maintenance (the
    * [[graft.ext.LexIndex]] consolidation caveat). */
  def consolidate(): Unit = {
    import spark.implicits._
    heal()
    if (!deltasTable.exists || !appliedTable.exists) return
    val v = cursor
    val token = s"consolidated-$v"
    // the cursor row goes FIRST, with n_rows = 0: once it is the top row,
    // heal() has nothing to re-apply — so neither a crash before the
    // overwrite (store untouched) nor after it (store folded) can make a
    // later heal re-append an applied range. Without this, a fully-
    // retracted aggregate would fold to ZERO rows, the overwrite would
    // erase the top token, and heal would re-apply that range forever.
    appliedTable.append(Seq((token, v, v, 0L)).toDF("token", "from_v", "to_v", "n_rows"))
    deltasTable.overwrite(
      fold(deltasTable.read().drop("token")).withColumn("token", lit(token)))
  }
}

object IncrementalAgg {
  def apply(spark: SparkSession, path: String, source: GraftTable,
      keyCols: Seq[String], sumCols: Seq[String] = Seq.empty,
      minMaxCols: Seq[String] = Seq.empty)(
      implicit settings: GraftSettings): IncrementalAgg =
    new IncrementalAgg(spark, path, source, keyCols, sumCols, minMaxCols)
}
