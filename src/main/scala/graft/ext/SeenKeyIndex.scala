package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted seen-key set: the incremental form of "keep the first row per
  * key, ever" — URL-level exact dedup of a crawl (key = hash of the
  * canonical URL, see [[Web.canonicalizeUrl]]), content-fingerprint dedup
  * (key = [[TextAnalysis.fingerprint]] hash), or any other keep-first-by-
  * key policy that must hold ACROSS ingest batches without rescanning the
  * corpus.
  *
  * Layout: one [[GraftTable]] at `path/keys` holding the distinct seen
  * keys (`k` LONG) — 8 bytes per distinct key, row text never enters the
  * index. With `trackOwners = true` each key also records the WINNING
  * row's id (`owner_id` LONG — 16 bytes/key), which is what makes
  * deletion expressible: [[remove]] tombstones owner ids, their keys stop
  * counting as seen (a later batch re-admits them with a new winner), and
  * [[purge]] physically drops the released rows at maintenance cadence —
  * the recrawl / right-to-erasure path the other persisted indexes
  * already have. An ownerless store keeps the 8-byte layout and refuses
  * remove/purge loudly (un-claiming without knowing the owner would
  * re-admit rows the policy already rejected on someone's behalf).
  *
  * Per batch: (a) vote the batch-internal winner per key (min id —
  * ids are assumed globally unique and ascending across batches, the
  * shared index sequencing contract), (b) probe the stored keys with the
  * batch's key set — the probe side broadcasts (gated by
  * `settings.probeBroadcastThresholdBytes`), so the stored side is ONE
  * SCAN with zero shuffle at any store size (keys are hash-uniform, so
  * file pruning can't bite; the win is scan-not-shuffle), (c) return only
  * winners with unseen keys, (d) append those keys.
  *
  * Replay safety (the [[BlockDedupIndex]] contract): pass `ingestToken`
  * (e.g. the foreachBatch batchId) and at-least-once redelivery becomes
  * idempotent — a replayed token recomputes against the pre-ingest store
  * SNAPSHOT (time travel) so the batch's own keys don't mask its result,
  * and the append anti-joins the CURRENT store so a crash gap between the
  * token append and the key append is filled without double-inserting.
  */
final class SeenKeyIndex(
    spark: SparkSession,
    path: String,
    trackOwners: Boolean = false)(
    implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {

  private[ext] val keysTable = GraftTable(spark, s"$path/keys")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "owner_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  /** Whether the persisted store carries owner ids. An existing store's
    * layout wins over the constructor flag — mixing row shapes within one
    * table would leave owner_id NULL on old rows and silently exempt them
    * from deletion. */
  def tracksOwners: Boolean = storeHasOwners

  private def storeHasOwners: Boolean =
    if (keysTable.exists) keysTable.read().columns.contains("owner_id")
    else trackOwners

  /** Stored rows whose owner is not tombstoned — the only rows that count
    * as "seen". Ownerless stores have no tombstones by construction
    * ([[remove]] refuses), so this is the identity there. */
  private def aliveKeys(df: DataFrame): DataFrame =
    if (storeHasOwners) withoutTombstoned(df, "owner_id") else df

  /** Distinct keys currently claimed (tombstoned owners excluded). */
  def indexedCount: Long =
    if (!keysTable.exists) 0L
    else aliveKeys(keysTable.read()).select("k").distinct().count()

  private def appliedVersion(token: String): Option[Long] = {
    if (!appliedTable.exists) return None
    appliedTable.read().filter(col("token") === token)
      .select("pre_version").collect().headOption.map(_.getLong(0))
  }

  /** Rows of `batch` that are their key's batch-internal winner (min
    * `idCol`) AND whose key was never seen by an earlier batch; appends
    * exactly those keys. `key` must be a deterministic LONG expression
    * over the row (e.g. `xxhash64(canonical_url)`). Rows with a NULL key
    * carry no identity to deduplicate on and pass through unconditionally.
    */
  def filterNovel(batch: DataFrame, idCol: String, key: Column,
      ingestToken: Option[String] = None): DataFrame = {
    import spark.implicits._
    val withOwners = storeHasOwners
    val replayOf = ingestToken.flatMap(appliedVersion)
    val preVersion = replayOf.getOrElse(keysTable.version)
    // keyed once: feeds the vote and the final row selection. Row TEXT
    // never shuffles — the vote moves only (key, id) pairs, and rows come
    // back via a broadcast semi-join on the bounded winner-id set.
    val keyed = Parallelism.materialize(batch.withColumn("__k", key))
    val keyless = keyed.filter(col("__k").isNull).drop("__k")
    val votes = Parallelism.materialize(
      keyed.filter(col("__k").isNotNull)
        .groupBy(col("__k")).agg(min(col(idCol)).as("__wid")))
    val known =
      if (keysTable.exists && preVersion > 0)
        aliveKeys(keysTable.readAt(preVersion)).select(col("k").as("__k"))
      else votes.select(col("__k")).limit(0)
    // store ∩ batch overlap: bounded by the batch, computed with the batch
    // side broadcast into the single stored scan
    val hits = Parallelism.materialize(
      known.join(
        Parallelism.maybeBroadcast(votes.select(col("__k")),
          settings.probeBroadcastThresholdBytes),
        Seq("__k"), "left_semi"))
    val novelIds = Parallelism.materialize(
      votes.join(Parallelism.maybeBroadcast(hits,
        settings.probeBroadcastThresholdBytes), Seq("__k"), "left_anti"))
    // token BEFORE the key append: a crash between the two leaves a
    // replayable gap the anti-join below fills (see class doc)
    ingestToken.filter(_ => replayOf.isEmpty).foreach { t =>
      appliedTable.append(Seq((t, preVersion)).toDF("token", "pre_version"))
    }
    failpoints.hit("after-token")
    def keyRows(df: DataFrame): DataFrame =
      if (withOwners) df.select(col("__k").as("k"), col("__wid").as("owner_id"))
      else df.select(col("__k").as("k"))
    val fresh = replayOf match {
      case None => keyRows(novelIds)
      case Some(_) if keysTable.exists => keyRows(novelIds)
        .join(aliveKeys(keysTable.read()).select(col("k")), Seq("k"), "left_anti")
      case Some(_) => keyRows(novelIds)
    }
    if (replayOf.isEmpty) keysTable.append(fresh)
    else if (fresh.limit(1).count() > 0) keysTable.append(fresh)
    keysTable.compactIfNeeded()
    keyed.join(
      Parallelism.maybeBroadcast(novelIds.select(col("__wid").as(idCol)),
        settings.probeBroadcastThresholdBytes),
      Seq(idCol), "left_semi")
      .drop("__k")
      .unionByName(keyless)
  }

  /** Tombstone the given winner ids, releasing every key they own: from
    * the next batch on, those keys count as unseen and a new winner may
    * claim them. Requires an owner-tracking store. */
  override def remove(ids: DataFrame, idCol: String): Unit = {
    require(storeHasOwners,
      s"SeenKeyIndex at $path stores keys without owner ids — " +
        "deletion needs trackOwners=true from the first ingest")
    super.remove(ids, idCol)
  }

  /** [[Tombstoned.purge]]'s store rewrite: drop the rows of tombstoned
    * owners (their keys were already invisible; this reclaims the bytes). */
  protected def purgeRewrite(removedIds: DataFrame): Unit = {
    if (keysTable.exists) {
      val rb = Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes)
      keysTable.overwrite(Parallelism.materialize(
        keysTable.read().join(rb, Seq("owner_id"), "left_anti")))
    }
  }
}
