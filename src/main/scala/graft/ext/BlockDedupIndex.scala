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
  * Deletion: a block hash is SHARED by every doc containing that block,
  * so a [[Tombstoned]]-style un-claim of a removed doc's hashes would
  * re-admit duplicates that other retained docs still legitimately
  * suppress. The default 8-byte store therefore has NO remove. Opting
  * into `trackClaims = true` switches the store to per-hash REFCOUNTS:
  * `claims` rows (h, d, token) where `d` is a claim-count delta — each
  * ingest appends +{docs in batch containing h}, [[remove]] recomputes
  * an erased doc's hashes FROM ITS TEXT and appends the matching
  * negative deltas, and a hash suppresses duplicates only while its live
  * count `sum(d)` stays positive — a block whose every claimant was
  * erased re-admits, a shared block stays suppressed. Append-only deltas
  * keep the replay contract intact (a batch's claim rows carry its
  * ingest token, so a replayed append is skipped whole); the history
  * compacts back to ≤ one row per live hash at [[consolidateClaims]]
  * cadence. The cost of erasability is the delta history plus 4 bytes of
  * count per row — callers without a right-to-erasure requirement keep
  * the flat 8-byte store.
  */
final class BlockDedupIndex(
    spark: SparkSession,
    path: String,
    blockWords: Int = 32,
    portable: Boolean = false,
    storeBuckets: Int = 0,
    trackClaims: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default) {

  private[ext] val blocksTable = GraftTable(spark, s"$path/blocks")
  private[ext] val claimsTable = GraftTable(spark, s"$path/claims")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")

  /** Whether this store refcounts block claims (erasure-capable). */
  def tracksClaims: Boolean = trackClaims

  /** The store the version/snapshot machinery tracks: claims when
    * refcounting, the flat hash set otherwise. */
  private def store: GraftTable = if (trackClaims) claimsTable else blocksTable

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints
  if (storeBuckets > 0 && !blocksTable.exists && blocksTable.bucketSpec.isEmpty)
    blocksTable.setBucketSpec(Seq("h"), storeBuckets)

  /** Distinct LIVE block hashes: in claims mode, hashes whose refcount is
    * still positive; otherwise the flat store's row count. */
  def indexedCount: Long =
    if (trackClaims)
      if (!claimsTable.exists) 0L
      else claimsTable.read().groupBy(col("h"))
        .agg(sum(col("d")).as("__n")).filter(col("__n") > 0).count()
    else if (blocksTable.exists) blocksTable.read().count()
    else 0L

  /** The store version a previously applied token observed, if any. */
  private def appliedVersion(token: String): Option[Long] = {
    if (!appliedTable.exists) return None
    appliedTable.read().filter(col("token") === token)
      .select("pre_version").collect().headOption.map(_.getLong(0))
  }

  /** Stats-only pass with ZERO store mutation — for pipelines whose
    * batch survivors are decided by LATER stages (near-dup, crash-replay
    * anti-joins) and that then record claims for exactly the docs that
    * LANDED via [[claim]]. Claims then refcount CORPUS-RESIDENT docs, so
    * [[remove]] can always release what an erasure deletes — a doc the
    * pipeline dropped after this pass never leaves an unreleasable ghost
    * claim suppressing a block forever. Same per-doc result shape as
    * [[detectAndAdd]], computed against the CURRENT store. */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    run(docs, idCol, textCol, ingestToken = None, mutate = false)

  /** Record +1 claim deltas for each (doc, distinct block hash) of `docs`
    * — the [[detect]]-mode mutation step, called with the batch's FINAL
    * corpus-resident survivors (claims mode only). `claimToken` makes a
    * replay a no-op, the same idempotence contract as `ingestToken`. */
  def claim(docs: DataFrame, idCol: String, textCol: String,
      claimToken: Option[String] = None): Unit = {
    require(trackClaims,
      s"BlockDedupIndex at $path was built without trackClaims=true — " +
        "the flat 8-byte store records hashes at detectAndAdd time instead")
    val applied = claimToken.exists(t => claimsTable.exists &&
      claimsTable.read().filter(col("token") === t).limit(1).count() > 0)
    if (applied) return
    val deltas = Dedup.blockRows(docs, idCol, textCol, blockWords, portable)
      .select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("d"))
      .select(col("__h").as("h"), col("d"),
        lit(claimToken.orNull).cast("string").as("token"))
    if (deltas.limit(1).count() > 0) claimsTable.append(deltas)
    claimsTable.compactIfNeeded()
    ()
  }

  /** Deduplicate `docs` against the index AND within the batch, then add
    * the batch's new block hashes (claims mode: +1 per containing doc in
    * THIS batch — callers that drop docs in later stages should prefer
    * [[detect]] + [[claim]] so refcounts track corpus residency).
    * Returns the same per-doc shape as [[Dedup.blockDedup]] (n_tokens,
    * n_blocks, kept_blocks, kept_tokens, kept_frac, kept_md5) where
    * "kept" means first occurrence in the batch AND never seen by any
    * earlier batch. */
  def detectAndAdd(docs: DataFrame, idCol: String, textCol: String,
      ingestToken: Option[String] = None): DataFrame =
    run(docs, idCol, textCol, ingestToken, mutate = true)

  private def run(docs: DataFrame, idCol: String, textCol: String,
      ingestToken: Option[String], mutate: Boolean): DataFrame = {
    import spark.implicits._
    // the snapshot this batch's stats are computed against: a replayed
    // token re-reads the PRE-INGEST version so its own hashes (appended
    // by the first attempt) don't count as "already known"
    val replayOf = ingestToken.flatMap(appliedVersion)
    val preVersion = replayOf.getOrElse(store.version)
    // materialized once: feeds the vote, the index probe, the stats
    // aggregation AND the append
    val blocks = Parallelism.materialize(
      Dedup.blockRows(docs, idCol, textCol, blockWords, portable))
    val winners = Dedup.blockWinners(blocks)
    // "known" = hashes that suppress duplicates at the snapshot: every
    // stored hash in the flat mode; hashes with a POSITIVE live refcount
    // in claims mode (a fully-erased block no longer suppresses — the
    // whole point of the refcounts)
    val known =
      if (!store.exists || preVersion <= 0) blocks.select(col("__h")).limit(0)
      else if (trackClaims)
        store.readAt(preVersion)
          .join(Parallelism.maybeBroadcast(
              winners.select(col("__h").as("h")),
              settings.probeBroadcastThresholdBytes),
            Seq("h"), "left_semi")
          .groupBy(col("h")).agg(sum(col("d")).as("__n"))
          .filter(col("__n") > 0)
          .select(col("h").as("__h"))
      else store.readAt(preVersion).select(col("h").as("__h"))
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
    if (!mutate) return out // detect(): stats only, the store is untouched
    // token is recorded BEFORE the hash append: a crash between the two
    // leaves a replayable gap (token present, hashes missing) that the
    // anti-join below fills without double-inserting; the reverse order
    // would let a replay observe its own hashes as known
    ingestToken.filter(_ => replayOf.isEmpty).foreach { t =>
      appliedTable.append(Seq((t, preVersion)).toDF("token", "pre_version"))
    }
    failpoints.hit("after-token")
    if (trackClaims) {
      // claims mode: EVERY hash the batch contains claims once per
      // containing doc (+count deltas) — known hashes increment their
      // refcount, new hashes open one. The delta append is atomic and
      // carries the ingest token, so a replayed batch skips it whole (a
      // crash in the token window left no claims row with this token)
      val applied = replayOf.nonEmpty && claimsTable.exists &&
        ingestToken.exists(t =>
          claimsTable.read().filter(col("token") === t).limit(1).count() > 0)
      if (!applied) {
        val deltas = blocks.select(col("__id"), col("__h")).distinct()
          .groupBy(col("__h")).agg(count(lit(1)).as("d"))
          .select(col("__h").as("h"), col("d"),
            lit(ingestToken.orNull).cast("string").as("token"))
        claimsTable.append(deltas)
      }
      claimsTable.compactIfNeeded()
    } else {
      val fresh = replayOf match {
        // normal ingest: snapshot == current store, so "not in hits" IS
        // "not yet stored" — derived from the already-materialized
        // overlap, the store is never scanned a second time
        case None => winners.select(col("__h").as("h"))
          .join(Parallelism.maybeBroadcast(hits.select(col("__h").as("h")),
            settings.probeBroadcastThresholdBytes), Seq("h"), "left_anti")
        // replay: the store moved since the snapshot (our own first
        // attempt and/or later batches) — dedup against the CURRENT store
        // so a crash-gap is filled but nothing is ever double-inserted; a
        // crash before the FIRST append leaves no store at all, so the
        // whole batch is the gap
        case Some(_) if blocksTable.exists => winners.select(col("__h").as("h"))
          .join(blocksTable.read().select(col("h")), Seq("h"), "left_anti")
        case Some(_) => winners.select(col("__h").as("h"))
      }
      if (replayOf.isEmpty) blocksTable.append(fresh)
      else if (fresh.limit(1).count() > 0) blocksTable.append(fresh)
      // file-count maintenance across a long-running crawl (bounded by
      // settings.maxNumFilesAllowed; dataChange=false)
      blocksTable.compactIfNeeded()
    }
    out
  }

  /** Release the claims an erased doc set held: each doc's distinct block
    * hashes are RECOMPUTED FROM ITS TEXT (the index stores no text — the
    * erasure caller still holds the rows it is about to delete) and
    * appended as negative deltas. A hash whose live count reaches zero
    * stops suppressing and re-admits on the next ingest; hashes other
    * retained docs also claimed stay suppressed.
    *
    * CONTRACT (loud, because the store cannot verify it): pass each
    * ingested doc at most once, with its ORIGINAL ingested text — a
    * double-remove or an edited text under-/mis-decrements shared counts.
    * `removeToken` makes a re-run of the same erasure a no-op (pass one;
    * [[graft.streaming.CorpusIngest.eraseDocs]] derives it from the id
    * set), the same idempotence the ingest side gets from its token. */
  def remove(docs: DataFrame, idCol: String, textCol: String,
      removeToken: Option[String] = None): Unit = {
    require(trackClaims,
      s"BlockDedupIndex at $path was built without trackClaims=true — " +
        "the flat 8-byte store cannot release shared block claims")
    if (!claimsTable.exists) return
    val applied = removeToken.exists(t =>
      claimsTable.read().filter(col("token") === t).limit(1).count() > 0)
    if (applied) return
    val deltas = Dedup.blockRows(docs, idCol, textCol, blockWords, portable)
      .select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg((count(lit(1)) * lit(-1L)).as("d"))
      .select(col("__h").as("h"), col("d"),
        lit(removeToken.orNull).cast("string").as("token"))
    if (deltas.limit(1).count() > 0) claimsTable.append(deltas)
  }

  /** Compact the claim-delta history to ≤ one row per LIVE hash (zero and
    * negative counts drop out physically). Run from the maintenance
    * window with no ingest in flight — consolidation folds away the
    * per-batch token markers a crashed ingest's replay would check. */
  def consolidateClaims(): Unit = {
    require(trackClaims, s"BlockDedupIndex at $path does not track claims")
    if (!claimsTable.exists) return
    val live = Parallelism.materialize(
      claimsTable.read().groupBy(col("h")).agg(sum(col("d")).as("d"))
        .filter(col("d") > 0)
        .select(col("h"), col("d"), lit(null).cast("string").as("token")))
    claimsTable.overwrite(live)
    ()
  }
}
