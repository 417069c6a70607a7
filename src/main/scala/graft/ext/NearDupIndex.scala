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
  * Ingesting a batch (a) minhashes only the batch, (b) probes the
  * stored band rows with the batch's bands on (band, band_key) — the
  * batch side broadcasts (gated by
  * `settings.probeBroadcastThresholdBytes`), so the stored side is ONE
  * SCAN with zero shuffle, never a re-shuffled corpus. File pruning
  * cannot bite here (probe band keys are hash-uniform, so every file may
  * hold one — the win is scan-not-shuffle, not skipped files). Then
  * (c) candidates are confirmed with the signature estimate, joining only
  * the CANDIDATE ids' signatures (candidate ids broadcast-semi-join into
  * the stored sigs scan — again no stored-side shuffle), (d) the batch's
  * bands+sigs append. The corpus is hashed exactly once, ever.
  *
  * `storeBuckets > 0` opts the bands store into a hash-bucketed layout
  * on band_key (stable per-bucket files across batches) — useful when an
  * external partitioning-aware reader or per-bucket maintenance consumes
  * the store. It does NOT change this class's probe plan (broadcast
  * probes already stream the store), so the default keeps appends flat
  * rather than paying a routing shuffle + per-bucket small files on
  * every batch.
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
    portable: Boolean = false,
    storeBuckets: Int = 0)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {
  require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
  private val rowsPerBand = numHashes / bands

  private[ext] val bandsTable = GraftTable(spark, s"$path/bands")
  private[ext] val sigsTable = GraftTable(spark, s"$path/sigs")
  // bucket the stored bands by band_key before the first write; an index
  // created by an older (unbucketed) version keeps its flat layout
  if (storeBuckets > 0 && !bandsTable.exists && bandsTable.bucketSpec.isEmpty)
    bandsTable.setBucketSpec(Seq("band_key"), storeBuckets)

  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "doc_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection points for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  /** Stored-side rows minus tombstoned docs — every probe of the stored
    * bands/sigs goes through this, so a removed doc stops matching new
    * batches immediately (tombstone sets are bounded between purges →
    * the anti-join broadcasts, the store still streams). */
  private def alive(df: DataFrame): DataFrame = withoutTombstoned(df, "doc_id")

  def indexedCount: Long =
    if (!sigsTable.exists) 0L
    else alive(sigsTable.read()).count()

  /** The store versions a previously applied token observed, if any. */
  private def appliedVersions(token: String): Option[(Long, Long)] = {
    if (!appliedTable.exists) return None
    appliedTable.read().filter(col("token") === token)
      .select("bands_pre", "sigs_pre").collect().headOption
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  /** Detect near-dups of `docs` against the index AND within the batch,
    * then add the batch to the index. Returns (id_new, id_matched,
    * est_jaccard) where `id_matched` is an already-indexed doc or an
    * earlier id from the same batch. Ids must be globally unique across
    * batches.
    *
    * Replay safety (the [[BlockDedupIndex]] contract): pass `ingestToken`
    * (e.g. the foreachBatch batchId) to make ingestion IDEMPOTENT under
    * at-least-once delivery. A replayed token probes the PRE-INGEST store
    * snapshot (time travel), so it returns the original pair set instead
    * of matching the batch against its own first attempt, and the append
    * side anti-joins the current store so nothing is double-inserted.
    * Without a token, a replayed batch self-matches every doc. */
  def detectAndAdd(docs0: DataFrame, idCol: String, textCol: String,
      ingestToken: Option[String] = None): DataFrame = {
    import spark.implicits._
    // tombstoned ids never (re-)enter the index: a late or replayed batch
    // carrying a doc removed in the meantime must not resurrect it
    val docs = withoutTombstoned(docs0, idCol)
    val replayOf = ingestToken.flatMap(appliedVersions)
    val (bandsPre, sigsPre) = replayOf.getOrElse((bandsTable.version, sigsTable.version))
    def bandsSnapshot: DataFrame = bandsTable.readAt(bandsPre)
    def sigsSnapshot: DataFrame = sigsTable.readAt(sigsPre)
    val bandsExist = bandsTable.exists && bandsPre > 0
    val sigsExist = sigsTable.exists && sigsPre > 0
    // materialize both derived frames: sigs feeds the band derivation,
    // the candidate-confirm joins AND the sigs append; newBands feeds
    // BOTH sides of the intra-batch self-join, the vs-index probe and the
    // bands append — unmaterialized, the md5 signature pipeline (the
    // expensive part) re-runs for every consumer (measured 7s -> bench
    // profile on d26; same lesson as the e04/d07 plan audit)
    val sigs = Parallelism.materialize(Dedup.minhashSignaturesDf(
      docs, idCol, textCol, numHashes, shingleSize, portable))
    val newBands = Parallelism.materialize(
      Dedup.minhashBands(sigs, bands, rowsPerBand, portable))

    // candidates within the batch itself (earlier id wins the "matched" slot)
    val intra = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") > col("b.id"))
      .select(col("a.id").as("id_new"), col("b.id").as("id_matched"))

    // candidates vs the already-indexed corpus (as of the probe snapshot —
    // current store on a normal ingest, the pre-ingest version on replay):
    // the batch's bands broadcast into the stored scan — the store
    // streams, nothing re-shuffles
    val vsIndex =
      if (!bandsExist) intra.limit(0) // first batch: same-typed empty frame
      else alive(bandsSnapshot)
        .select(col("doc_id").as("id_matched"), col("band"), col("band_key"))
        .join(Parallelism.maybeBroadcast(
            newBands.select(col("id").as("id_new"), col("band"), col("band_key")),
            settings.probeBroadcastThresholdBytes),
          Seq("band", "band_key"))
        .select("id_new", "id_matched")

    val allSigs =
      if (sigsExist)
        sigs.select(col("id").as("doc_id"), col("sig")).unionByName(alive(sigsSnapshot))
      else sigs.select(col("id").as("doc_id"), col("sig"))

    // candidate pairs once (bounded: matched bands only), then attach
    // signatures for ONLY the candidate ids — the id set broadcast-semi-
    // joins into the stored sigs scan, so the 100 TB sig store is never
    // shuffled for a batch-sized probe. The two barriers exist to stop
    // the STORE being re-scanned per consumer; on the first batch there
    // is no store and every input below is already materialized, so
    // recomputation is an in-memory join and the barriers are pure cost.
    def barrierIfStored(frame: DataFrame): DataFrame =
      if (bandsExist) Parallelism.materialize(frame) else frame
    val cand = barrierIfStored(vsIndex.unionByName(intra).distinct())
    val neededIds = cand.select(col("id_new").as("doc_id"))
      .unionByName(cand.select(col("id_matched").as("doc_id"))).distinct()
    val candSigs = barrierIfStored(
      allSigs.join(
        Parallelism.maybeBroadcast(neededIds, settings.probeBroadcastThresholdBytes),
        Seq("doc_id"), "left_semi"))

    val pairs0 = cand
      .join(candSigs.select(col("doc_id").as("id_new"), col("sig").as("sig_new")), Seq("id_new"))
      .join(candSigs.select(col("doc_id").as("id_matched"), col("sig").as("sig_old")), Seq("id_matched"))
      .withColumn("est_jaccard", Dedup.estimatedJaccard(col("sig_new"), col("sig_old")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_new", "id_matched", "est_jaccard")

    // replay probes a PRE-INGEST snapshot, and a remove+purge may have
    // physically erased docs between the crash and the redelivery — with
    // the tombstones purge cleared, alive() can no longer filter them, so
    // the replayed stats must drop pairs whose matched doc exists nowhere
    // NOW (neither the current store nor this batch): an erased doc must
    // not leak back through redelivered match results. Rare path — the
    // extra store scan prices only replays.
    val pairs = replayOf match {
      case None => pairs0
      case Some(_) =>
        val liveIds =
          (if (sigsTable.exists) alive(sigsTable.read()).select(col("doc_id"))
           else sigs.select(col("id").as("doc_id")).limit(0))
            .unionByName(sigs.select(col("id").as("doc_id")))
            .withColumnRenamed("doc_id", "id_matched")
        pairs0.join(liveIds.distinct(), Seq("id_matched"), "left_semi")
    }

    // materialize results BEFORE mutating the index, so the returned frame
    // doesn't observe the batch's own rows as "already indexed"
    val out = Parallelism.materialize(pairs)
    // token recorded BEFORE the appends (the BlockDedupIndex ordering): a
    // crash between leaves a gap the replay path fills idempotently
    ingestToken.filter(_ => replayOf.isEmpty).foreach { t =>
      appliedTable.append(Seq((t, bandsPre, sigsPre)).toDF("token", "bands_pre", "sigs_pre"))
    }
    failpoints.hit("after-token")
    val (bandRows, sigRows) = replayOf match {
      // normal ingest: ids are globally unique, so the whole batch is new
      case None =>
        (newBands.select(col("id").as("doc_id"), col("band"), col("band_key")),
          sigs.select(col("id").as("doc_id"), col("sig")))
      // replay: append only ids missing from EACH store — the crash gap
      // can sit between the two appends (bands landed, sigs didn't), so
      // a single-store membership test would double-insert the other
      case Some(_) =>
        def missingFrom(t: GraftTable, rows: DataFrame): DataFrame =
          if (!t.exists) rows
          else rows.join(t.read().select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
        (missingFrom(bandsTable,
            newBands.select(col("id").as("doc_id"), col("band"), col("band_key"))),
          missingFrom(sigsTable, sigs.select(col("id").as("doc_id"), col("sig"))))
    }
    if (replayOf.isEmpty) {
      bandsTable.append(bandRows)
      failpoints.hit("after-bands")
      sigsTable.append(sigRows)
    } else {
      // per-store: only the store with a gap gets its fill appended
      if (bandRows.limit(1).count() > 0) bandsTable.append(bandRows)
      if (sigRows.limit(1).count() > 0) sigsTable.append(sigRows)
    }
    // file-count maintenance across a long-running crawl (bounded by
    // settings.maxNumFilesAllowed; dataChange=false)
    bandsTable.compactIfNeeded()
    sigsTable.compactIfNeeded()
    out
  }

  /** [[Tombstoned.purge]]'s store rewrite: bands+sigs minus the tombstoned
    * docs ([[GraftTable.overwrite]] re-stages through the configured
    * bucket spec, so a `storeBuckets` layout survives). */
  protected def purgeRewrite(removedIds: DataFrame): Unit = {
    val rb = Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes)
    Seq(bandsTable, sigsTable).filter(_.exists).foreach { t =>
      t.overwrite(Parallelism.materialize(
        t.read().join(rb, Seq("doc_id"), "left_anti")))
    }
  }
}
