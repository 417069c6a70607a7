package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental near-duplicate index — the 100 TB dedup workflow:
  * a crawl corpus grows batch by batch, and each new batch must be checked
  * against EVERYTHING ingested so far without re-hashing the corpus.
  *
  * Layout: two [[GraftTable]]s under `path` —
  * `bands` (doc_id, band, band_key) and `sigs` (doc_id, sig array<long>).
  * Ingesting a batch (a) minhashes only the batch, (b) joins the batch's
  * band rows against the stored band rows on (band, band_key) — at scale
  * the stored side is bucketed by band_key, so this is a co-located join
  * of the batch against only the matching buckets, never a corpus scan —
  * (c) confirms candidates with the signature estimate, (d) appends the
  * batch's bands+sigs. The corpus is hashed exactly once, ever.
  *
  * Scale notes: shuffle volume per batch is O(batch bands + matched
  * candidates); signatures join back only for candidate ids; the band
  * table's value column is a short string/long — payload text never
  * enters the index.
  */
final class NearDupIndex(
    spark: SparkSession,
    path: String,
    numHashes: Int = 32,
    bands: Int = 8,
    shingleSize: Int = 3,
    threshold: Double = 0.5,
    portable: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default) {
  require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
  private val rowsPerBand = numHashes / bands

  private[ext] val bandsTable = GraftTable(spark, s"$path/bands")
  private[ext] val sigsTable = GraftTable(spark, s"$path/sigs")

  def indexedCount: Long = if (sigsTable.exists) sigsTable.read().count() else 0L

  /** Detect near-dups of `docs` against the index AND within the batch,
    * then add the batch to the index. Returns (id_new, id_matched,
    * est_jaccard) where `id_matched` is an already-indexed doc or an
    * earlier id from the same batch. Re-ingesting an id is the caller's
    * concern (ids must be globally unique). */
  def detectAndAdd(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize both derived frames: sigs feeds the band derivation,
    // the candidate-confirm joins AND the sigs append; newBands feeds
    // BOTH sides of the intra-batch self-join, the vs-index join and the
    // bands append — unmaterialized, the md5 signature pipeline (the
    // expensive part) re-runs for every consumer (measured 7s -> bench
    // profile on d26; same lesson as the e04/d07 plan audit)
    val sigs = Dedup.minhashSignaturesDf(
        docs, idCol, textCol, numHashes, shingleSize, portable)
      .localCheckpoint(true)
    val newBands = Dedup.minhashBands(sigs, bands, rowsPerBand, portable)
      .localCheckpoint(true)

    // candidates within the batch itself (earlier id wins the "matched" slot)
    val intra = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") > col("b.id"))
      .select(col("a.id").as("id_new"), col("b.id").as("id_matched"))

    // candidates vs the already-indexed corpus
    val vsIndex =
      if (!bandsTable.exists) intra.limit(0) // first batch: same-typed empty frame
      else newBands.select(col("id").as("id_new"), col("band"), col("band_key"))
        .join(bandsTable.read().select(col("doc_id").as("id_matched"), col("band"), col("band_key")),
          Seq("band", "band_key"))
        .select("id_new", "id_matched")

    val allSigs =
      if (sigsTable.exists)
        sigs.select(col("id").as("doc_id"), col("sig")).unionByName(sigsTable.read())
      else sigs.select(col("id").as("doc_id"), col("sig"))

    val pairs = vsIndex.unionByName(intra).distinct()
      .join(allSigs.select(col("doc_id").as("id_new"), col("sig").as("sig_new")), Seq("id_new"))
      .join(allSigs.select(col("doc_id").as("id_matched"), col("sig").as("sig_old")), Seq("id_matched"))
      .withColumn("est_jaccard", Dedup.estimatedJaccard(col("sig_new"), col("sig_old")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_new", "id_matched", "est_jaccard")

    // materialize results BEFORE mutating the index, so the returned frame
    // doesn't observe the batch's own rows as "already indexed"
    // (localCheckpoint, not cache: checkpoint blocks are released by the
    // ContextCleaner once unreferenced; CacheManager entries leak)
    val out = pairs.localCheckpoint(true)
    bandsTable.append(newBands.select(col("id").as("doc_id"), col("band"), col("band_key")))
    sigsTable.append(sigs.select(col("id").as("doc_id"), col("sig")))
    out
  }
}
