package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental block-dedup index — the batch-ingest form of
  * [[Dedup.blockDedup]]: a corpus grows crawl batch by crawl batch, and
  * each batch's word-blocks must be deduplicated against every block EVER
  * ingested without rescanning the corpus (the [[NearDupIndex]] workflow
  * at paragraph granularity).
  *
  * Layout: one [[GraftTable]] at `path/blocks` holding the distinct block
  * hashes (`h` LONG) — 8 bytes per distinct block; block TEXT never
  * enters the index. Ingesting a batch (a) derives the batch's block rows
  * (the shared [[Dedup.blockRows]] derivation), (b) votes the
  * batch-internal first occurrence per hash, (c) probes the stored hashes
  * with the batch's hash set — the probe side broadcasts (gated by
  * `settings.probeBroadcastThresholdBytes`), so the stored side is ONE
  * SCAN with zero shuffle, never a re-shuffled corpus (file pruning
  * can't bite: hashes are uniform, so every file may hold a probed
  * value; the win is scan-not-shuffle) — and (d) appends the batch's
  * previously unseen hashes. `storeBuckets > 0` opts into a
  * hash-bucketed store layout on `h` for external partitioning-aware
  * consumers; it does not change this class's probe plan (see the
  * [[NearDupIndex]] note), so the default appends flat.
  *
  * Sequencing contract (same as [[NearDupIndex]]): ingesting batches
  * B1, B2 equals one-shot `blockDedup(B1 ∪ B2)` when batches arrive in
  * ascending doc-id order — the one-shot winner rule is min (doc, pos),
  * and the index freezes each earlier batch's occurrences as winners.
  *
  * Replay safety: pass `ingestToken` (e.g. the foreachBatch batchId) to
  * make ingestion IDEMPOTENT under at-least-once delivery. Each applied
  * token is recorded with the store version it observed; a replayed token
  * recomputes its stats against that SNAPSHOT (time travel), so the
  * replay returns the original result instead of seeing its own hashes
  * as "already known" (kept_blocks=0 corruption), and the append side
  * anti-joins the CURRENT store so nothing is double-inserted. Without a
  * token, a replayed batch corrupts its own stats — only omit it for
  * exactly-once callers.
  *
  * No `remove`/`purge` here, unlike the other persisted indexes
  * ([[Tombstoned]]): a block hash is SHARED by every doc containing
  * that block, so un-claiming a removed doc's hashes would re-admit
  * duplicates that other retained docs still legitimately suppress.
  * Correct deletion needs per-hash refcounts (count per ingest, decrement
  * on remove, drop at zero) — a deliberate seam left out of the 8-byte
  * store until a caller needs it.
  */
final class BlockDedupIndex(
    spark: SparkSession,
    path: String,
    blockWords: Int = 32,
    portable: Boolean = false,
    storeBuckets: Int = 0)(implicit settings: GraftSettings = GraftSettings.default) {

  private[ext] val blocksTable = GraftTable(spark, s"$path/blocks")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints
  if (storeBuckets > 0 && !blocksTable.exists && blocksTable.bucketSpec.isEmpty)
    blocksTable.setBucketSpec(Seq("h"), storeBuckets)

  /** Distinct block hashes ingested so far. */
  def indexedCount: Long = if (blocksTable.exists) blocksTable.read().count() else 0L

  /** The store version a previously applied token observed, if any. */
  private def appliedVersion(token: String): Option[Long] = {
    if (!appliedTable.exists) return None
    appliedTable.read().filter(col("token") === token)
      .select("pre_version").collect().headOption.map(_.getLong(0))
  }

  /** Deduplicate `docs` against the index AND within the batch, then add
    * the batch's new block hashes. Returns the same per-doc shape as
    * [[Dedup.blockDedup]] (n_tokens, n_blocks, kept_blocks, kept_tokens,
    * kept_frac, kept_md5) where "kept" means first occurrence in the
    * batch AND never seen by any earlier batch. */
  def detectAndAdd(docs: DataFrame, idCol: String, textCol: String,
      ingestToken: Option[String] = None): DataFrame = {
    import spark.implicits._
    // the snapshot this batch's stats are computed against: a replayed
    // token re-reads the PRE-INGEST version so its own hashes (appended
    // by the first attempt) don't count as "already known"
    val replayOf = ingestToken.flatMap(appliedVersion)
    val preVersion = replayOf.getOrElse(blocksTable.version)
    // materialized once: feeds the vote, the index probe, the stats
    // aggregation AND the append
    val blocks = Parallelism.materialize(
      Dedup.blockRows(docs, idCol, textCol, blockWords, portable))
    val winners = Dedup.blockWinners(blocks)
    val known =
      if (blocksTable.exists && preVersion > 0)
        blocksTable.readAt(preVersion).select(col("h").as("__h"))
      else blocks.select(col("__h")).limit(0)
    // the batch's hash set broadcasts into the stored scan (one row per
    // distinct hash — `winners` is already per-hash); `hits` is the
    // store∩batch overlap, bounded by the batch, and feeds the keep-flag
    // join AND the fresh-hash anti-join without rescanning the store
    val hits = Parallelism.materialize(
      known.join(
        Parallelism.maybeBroadcast(winners.select(col("__h")),
          settings.probeBroadcastThresholdBytes),
        Seq("__h"), "left_semi"))
    val flagged = blocks.join(winners, Seq("__h"))
      .join(Parallelism.maybeBroadcast(hits.withColumn("__known", lit(true)),
        settings.probeBroadcastThresholdBytes), Seq("__h"), "left")
      .withColumn("__keep",
        col("__id") === col("__wid") && col("__pos") === col("__wpos") &&
          col("__known").isNull)
    // materialize results BEFORE mutating the index, so the returned frame
    // doesn't observe the batch's own hashes as "already indexed"
    val out = Parallelism.materialize(Dedup.blockStats(docs, idCol, textCol, flagged))
    // token is recorded BEFORE the hash append: a crash between the two
    // leaves a replayable gap (token present, hashes missing) that the
    // anti-join below fills without double-inserting; the reverse order
    // would let a replay observe its own hashes as known
    ingestToken.filter(_ => replayOf.isEmpty).foreach { t =>
      appliedTable.append(Seq((t, preVersion)).toDF("token", "pre_version"))
    }
    failpoints.hit("after-token")
    val fresh = replayOf match {
      // normal ingest: snapshot == current store, so "not in hits" IS "not
      // yet stored" — derived from the already-materialized overlap, the
      // store is never scanned a second time
      case None => winners.select(col("__h").as("h"))
        .join(Parallelism.maybeBroadcast(hits.select(col("__h").as("h")),
          settings.probeBroadcastThresholdBytes), Seq("h"), "left_anti")
      // replay: the store moved since the snapshot (our own first attempt
      // and/or later batches) — dedup against the CURRENT store so a
      // crash-gap is filled but nothing is ever double-inserted; a crash
      // before the FIRST append leaves no store at all, so the whole
      // batch is the gap
      case Some(_) if blocksTable.exists => winners.select(col("__h").as("h"))
        .join(blocksTable.read().select(col("h")), Seq("h"), "left_anti")
      case Some(_) => winners.select(col("__h").as("h"))
    }
    if (replayOf.isEmpty) blocksTable.append(fresh)
    else if (fresh.limit(1).count() > 0) blocksTable.append(fresh)
    // file-count maintenance across a long-running crawl (bounded by
    // settings.maxNumFilesAllowed; dataChange=false)
    blocksTable.compactIfNeeded()
    out
  }
}
