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
  * index. Per batch: (a) vote the batch-internal winner per key (min id —
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
  *
  * No `remove`/`purge` ([[Tombstoned]]): like a block hash, a seen key is
  * a claim ("this key's winner is already in the corpus") that later
  * batches have relied on; un-claiming would re-admit rows the policy
  * already rejected. Deletion needs the owning row's id alongside the key
  * — a seam deliberately left out of the 8-byte store until needed.
  */
final class SeenKeyIndex(
    spark: SparkSession,
    path: String)(implicit settings: GraftSettings = GraftSettings.default) {

  private[ext] val keysTable = GraftTable(spark, s"$path/keys")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  /** Distinct keys seen so far. */
  def indexedCount: Long = if (keysTable.exists) keysTable.read().count() else 0L

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
        keysTable.readAt(preVersion).select(col("k").as("__k"))
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
    val fresh = replayOf match {
      case None => novelIds.select(col("__k").as("k"))
      case Some(_) if keysTable.exists => novelIds.select(col("__k").as("k"))
        .join(keysTable.read().select(col("k")), Seq("k"), "left_anti")
      case Some(_) => novelIds.select(col("__k").as("k"))
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
}
