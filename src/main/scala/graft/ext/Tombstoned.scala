package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared soft-delete machinery for the persisted indexes ([[AnnIndex]],
  * [[IvfIndex]], [[PqIndex]], [[NearDupIndex]]): [[remove]] tombstones ids
  * — one row each, NO store rewrite, because at 100 TB an inline delete
  * may not rewrite a clustered store (the Lucene/FAISS soft-delete shape,
  * the maintenance op a recrawl or right-to-erasure request needs) — and
  * [[purge]] physically rewrites at maintenance cadence via the
  * store-specific [[purgeRewrite]]. Keeping the contract in ONE place is
  * the point: a fix to the replay/erasure semantics must not need
  * re-finding in four copies.
  *
  * Tombstoned ids (a) drop out of every query/match BEFORE ranking (each
  * index anti-joins [[tombstones]] into its candidate path), (b) are
  * excluded from FUTURE adds while tombstoned (so a late or replayed
  * batch cannot resurrect an erased id), and (c) vanish physically at
  * [[purge]]. Re-removing is idempotent; re-ADDING a tombstoned id is a
  * silent no-op until a purge clears the tombstone.
  *
  * Single-maintainer contract: one instance performs remove/purge. The
  * emptiness flag is cached per instance so a purged long-lived index
  * doesn't pay a useless empty anti-join per query forever; concurrent
  * remove/purge from a second instance is an operator error (reads stay
  * correct, the cache only governs skipping provably-empty work).
  */
private[ext] trait Tombstoned {
  /** The tombstone store: one id column named [[tombstoneIdCol]]. */
  private[ext] def removedTable: GraftTable
  protected def tombstoneIdCol: String
  protected def tombstoneSettings: GraftSettings

  @volatile private var hasTombstones: Option[Boolean] = None

  /** Live tombstones, or None when there are none (cached emptiness —
    * after a purge the hot paths skip the anti-join entirely). */
  protected final def tombstones: Option[DataFrame] = {
    val has = hasTombstones.getOrElse {
      val h = removedTable.exists &&
        removedTable.read().limit(1).count() > 0
      hasTombstones = Some(h)
      h
    }
    if (has) Some(removedTable.read().select(tombstoneIdCol)) else None
  }

  /** Anti-join `df` (keyed by `idCol`) against the live tombstones — the
    * hook every index's candidate path and add path routes through. */
  protected final def withoutTombstoned(df: DataFrame, idCol: String): DataFrame =
    tombstones.fold(df) { r =>
      df.join(
        Parallelism.maybeBroadcast(r.withColumnRenamed(tombstoneIdCol, idCol),
          tombstoneSettings.probeBroadcastThresholdBytes),
        Seq(idCol), "left_anti")
    }

  /** Tombstone `ids`: gone from every later query/match and from future
    * adds immediately; physical removal at [[purge]]. Idempotent. */
  def remove(ids: DataFrame, idCol: String): Unit = {
    val rows = ids.select(col(idCol).as(tombstoneIdCol)).distinct()
    val fresh = tombstones.fold(rows)(r => rows.join(r, Seq(tombstoneIdCol), "left_anti"))
    if (fresh.limit(1).count() > 0) {
      removedTable.append(fresh)
      hasTombstones = Some(true)
    }
  }

  /** Store-specific physical rewrite dropping `removedIds` (already
    * materialized, non-empty). */
  protected def purgeRewrite(removedIds: DataFrame): Unit

  /** Physically rewrite the stores without the tombstoned rows and clear
    * the tombstones. Run ONLY from the maintenance window, with no ingest
    * in flight: a crashed ingest whose token landed but whose rows did
    * not, replayed AFTER a purge cleared the tombstones, would re-add ids
    * removed in between (adds filter tombstoned ids, but a purge erases
    * the tombstones they would have checked). */
  def purge(): Unit = tombstones.foreach { r0 =>
    val r = Parallelism.materialize(r0)(tombstoneSettings)
    if (r.limit(1).count() > 0) purgeRewrite(r)
    removedTable.overwrite(r.limit(0))
    hasTombstones = Some(false)
  }
}
