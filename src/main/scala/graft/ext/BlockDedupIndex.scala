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
  * (the shared [[Dedup.blockRows]] derivation), (b) votes the batch-
  * internal first occurrence per hash, (c) left-joins the batch's hashes
  * against the stored set — at scale the stored table is hash-bucketed on
  * `h`, so this is a co-located join of the batch against matching
  * buckets, never a corpus scan — and (d) appends the batch's previously
  * unseen hashes.
  *
  * Sequencing contract (same as [[NearDupIndex]]): ingesting batches
  * B1, B2 equals one-shot `blockDedup(B1 ∪ B2)` when batches arrive in
  * ascending doc-id order — the one-shot winner rule is min (doc, pos),
  * and the index freezes each earlier batch's occurrences as winners.
  */
final class BlockDedupIndex(
    spark: SparkSession,
    path: String,
    blockWords: Int = 32,
    portable: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default) {

  private[ext] val blocksTable = GraftTable(spark, s"$path/blocks")

  /** Distinct block hashes ingested so far. */
  def indexedCount: Long = if (blocksTable.exists) blocksTable.read().count() else 0L

  /** Deduplicate `docs` against the index AND within the batch, then add
    * the batch's new block hashes. Returns the same per-doc shape as
    * [[Dedup.blockDedup]] (n_tokens, n_blocks, kept_blocks, kept_tokens,
    * kept_frac, kept_md5) where "kept" means first occurrence in the
    * batch AND never seen by any earlier batch. */
  def detectAndAdd(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialized once: feeds the vote, the index probe, the stats
    // aggregation AND the append
    val blocks = Dedup.blockRows(docs, idCol, textCol, blockWords, portable)
      .localCheckpoint(true)
    val winners = Dedup.blockWinners(blocks)
    val known =
      if (blocksTable.exists) blocksTable.read().select(col("h").as("__h"))
      else blocks.select(col("__h")).limit(0)
    val flagged = blocks.join(winners, Seq("__h"))
      .join(known.withColumn("__known", lit(true)), Seq("__h"), "left")
      .withColumn("__keep",
        col("__id") === col("__wid") && col("__pos") === col("__wpos") &&
          col("__known").isNull)
    // materialize results BEFORE mutating the index, so the returned frame
    // doesn't observe the batch's own hashes as "already indexed"
    val out = Dedup.blockStats(docs, idCol, textCol, flagged).localCheckpoint(true)
    val fresh = winners.select(col("__h").as("h"))
      .join(known.select(col("__h").as("h")), Seq("h"), "left_anti")
    blocksTable.append(fresh)
    out
  }
}
