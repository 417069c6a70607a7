package graft.streaming

import graft.conf.GraftSettings
import graft.ext.{BlockDedupIndex, LexIndex, NearDupIndex, SeenKeyIndex, TextAnalysis, Warc, Web}
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/** The assembled training-corpus ingestion pipeline — the production
  * composition of the pieces the operator catalog proves individually:
  * per micro-batch, documents optionally pass the crawl front end
  * (domain blocklist + URL-level exact dedup on the canonical URL —
  * [[Web]] + [[SeenKeyIndex]] — the cheapest rejections first, before
  * any text is touched), are PII-scrubbed ([[TextAnalysis.redactPii]]),
  * quality-gated ([[TextAnalysis.withTextMetrics]], then optionally a
  * trained [[graft.ext.Classifier]] NB model — the FineWeb-Edu/DCLM
  * model-based-filtering stage), optionally dropped
  * when they carry no never-seen word-block ([[BlockDedupIndex]] — the
  * RefinedWeb "exact substring" pass), checked against the PERSISTED
  * near-dup index ([[NearDupIndex]] — the corpus is minhashed once,
  * ever), and only novel survivors land in the curated [[GraftTable]].
  *
  * Crash safety end to end: the runner is a checkpointed AvailableNow
  * stream (a re-run with no new files is a no-op; a crashed run resumes
  * at the uncommitted batch), and every index mutation carries the
  * batchId as its ingest token, so an at-least-once redelivery neither
  * self-matches nor double-inserts (the [[graft.ext.Tombstoned]] /
  * replay contract, crash-injected end-to-end in CrashReplaySpec).
  *
  * Contracts inherited from the indexes: doc ids globally unique and
  * arriving in ascending order across batches (the dedup winner rule);
  * one writer. Embedding-side indexing ([[graft.ext.AnnIndex]] /
  * [[graft.ext.IvfIndex]] / [[graft.ext.PqIndex]]) stays a separate
  * entry point — embeddings come from a model, not from this text
  * pipeline; [[EmbeddingIngest]] is its assembled sibling.
  *
  * Scale shape per batch: every stage is scan-plus-broadcast against the
  * batch (the stored index sides never shuffle — see the index
  * scaladocs); the only corpus-sized frames ever touched are the index
  * stores, each scanned at most once per batch.
  */
final class CorpusIngest(
    spark: SparkSession,
    root: String,
    idCol: String = "doc_id",
    textCol: String = "text",
    minQuality: Double = 0.3,
    minTokens: Int = 5,
    scrubPii: Boolean = true,
    blockWords: Int = 0,
    blockTrackClaims: Boolean = false,
    urlCol: Option[String] = None,
    blockedDomains: Seq[String] = Nil,
    urlTrackOwners: Boolean = false,
    nbModelPath: Option[String] = None,
    nbThresholdMicro: Long = 0L,
    buildLexIndex: Boolean = false)(
    implicit settings: GraftSettings = GraftSettings.default) {

  // the crawl front end hangs off urlCol: a blocklist (or owner tracking)
  // without it would be silently ignored — misconfiguration must be loud,
  // not a pipeline that quietly ingests blocked domains
  require(blockedDomains.isEmpty || urlCol.nonEmpty,
    "blockedDomains requires urlCol (the blocklist filters on the URL's host)")
  require(!urlTrackOwners || urlCol.nonEmpty,
    "urlTrackOwners requires urlCol (owners are tracked in the URL dedup index)")

  val corpusTable: GraftTable = GraftTable(spark, s"$root/corpus")
  val nearDupIndex: NearDupIndex = new NearDupIndex(spark, s"$root/neardup")
  require(!blockTrackClaims || blockWords > 0,
    "blockTrackClaims requires blockWords > 0 (there is no block index to refcount)")

  /** Block-level dedup stage, enabled by `blockWords > 0`; with
    * `blockTrackClaims` the store refcounts per-hash claims, which is
    * what lets [[eraseDocs]] release erased docs' block claims (solely-
    * owned blocks re-admit, shared blocks stay suppressed). */
  val blockIndex: Option[BlockDedupIndex] =
    if (blockWords > 0) Some(new BlockDedupIndex(spark, s"$root/blocks", blockWords,
      trackClaims = blockTrackClaims))
    else None
  /** URL-level exact-dedup store, enabled by `urlCol`; with
    * `urlTrackOwners` each URL claim records its winning doc id, which is
    * what lets [[eraseDocs]] release erased docs' URLs for recrawl. */
  val urlIndex: Option[SeenKeyIndex] =
    urlCol.map(_ => new SeenKeyIndex(spark, s"$root/urls", trackOwners = urlTrackOwners))
  /** Model-based quality stage (FineWeb-Edu/DCLM shape), enabled by
    * `nbModelPath`: a [[graft.ext.Classifier]] NB artifact loaded ONCE
    * per pipeline instance (not per batch — two extra scans per
    * micro-batch forever would be the same fixed-cost mistake the log
    * listing cache fixed) and applied after the heuristic gate. The
    * model frames are plain parquet scans, so executors fetch them like
    * any other input; only the one-row scalars frame broadcasts. */
  val nbModel: Option[graft.ext.Classifier.NbModel] =
    nbModelPath.map(graft.ext.Classifier.loadModel(spark, _))
  /** Serving-side BM25 index maintained AT INGEST (`buildLexIndex`): every
    * batch's final survivors — exactly the rows appended to the curated
    * corpus — are tokenized once into the [[LexIndex]], so the corpus is
    * keyword-searchable (and hybrid-fusable with an ANN shortlist via
    * [[graft.ext.Similarity.rrfFuse]]) the moment a batch lands, without
    * ever re-tokenizing what's already indexed. */
  val lexIndex: Option[LexIndex] =
    if (buildLexIndex) Some(new LexIndex(spark, s"$root/lex")) else None

  /** One batch through the full pipeline (also the foreachBatch body —
    * callable directly for non-streaming backfills; pass a unique
    * `token` per batch for at-least-once safety). Runs under a
    * [[graft.ext.Parallelism.scoped]] release scope: every barrier the
    * stages materialize is freed the moment the batch completes, so a
    * long-running ingest stream holds a bounded block footprint instead
    * of leaking each batch's checkpoints until a GC cycle. */
  def ingestBatch(batch: DataFrame, token: String): Unit =
    graft.ext.Parallelism.scoped { ingestBatchImpl(batch, token) }

  private def ingestBatchImpl(batch: DataFrame, token: String): Unit = {
    // crawl front end first — metadata-only rejections, no text touched:
    // blocklisted hosts dropped by a zero-shuffle literal filter, then
    // URL-level exact dedup on the canonical URL (docs without a
    // parseable URL carry no URL identity and pass through)
    val routed = (urlCol, urlIndex) match {
      case (Some(u), Some(uIdx)) =>
        val unblocked =
          if (blockedDomains.isEmpty) batch
          else Web.blocklistFilter(
            batch.withColumn("__host", Web.host(col(u))), "__host", blockedDomains)
            .drop("__host")
        // xxhash64 is null-safe (hash-of-nothing, a CONSTANT) — guard it,
        // or every unparseable URL would share one key and dedup to a
        // single survivor; NULL means "no URL identity, pass through"
        val canon = Web.canonicalizeUrl(col(u))
        uIdx.filterNovel(unblocked, idCol,
          when(canon.isNotNull, xxhash64(canon)),
          ingestToken = Some(s"url-$token"))
      case _ => batch
    }
    val scrubbed =
      if (scrubPii) routed.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      else routed
    // consumed by every downstream stage AND the final append: barrier so
    // the scrub+metrics pipeline runs once, not once per consumer. The
    // crawl URL (when configured) rides through to the curated corpus —
    // provenance is part of a training corpus, and re-deriving it later
    // would need a second pass over the raw crawl.
    val kept = col(idCol) +: col(textCol) +:
      urlCol.filter(scrubbed.columns.contains).map(col).toSeq
    val quality = graft.ext.Parallelism.materialize(
      TextAnalysis.withTextMetrics(scrubbed, textCol)
        .filter(col("quality_score") >= minQuality && col("n_tokens") >= minTokens)
        .select(kept: _*))
    if (quality.isEmpty) return
    // model-based quality stage: heuristic survivors are scored under the
    // trained log-odds and must clear the threshold. Semi-join keeps the
    // batch's columns untouched; the score aggregate is the stage's one
    // shuffle (the vocab join is token-keyed — see Classifier's scaladoc).
    // Stateless and deterministic, so it sits OUTSIDE the replay-token
    // contract: a redelivered batch re-scores to the identical keep set.
    val modelKept = nbModel match {
      case None => quality
      case Some(m) =>
        quality.join(
          graft.ext.Classifier.nbScore(quality, idCol, textCol, m)
            .filter(col("nb_score_micro") > nbThresholdMicro)
            .select(col(idCol)),
          Seq(idCol), "left_semi")
          .transform(graft.ext.Parallelism.materialize(_))
    }
    if (modelKept.isEmpty) return
    // block pass first (cheaper store: 8 bytes/distinct block): a doc
    // whose every word-block was already ingested is an exact-substring
    // composite of the corpus — drop it before paying the minhash
    val afterBlocks = blockIndex match {
      case None => modelKept
      case Some(bIdx) =>
        // claims mode: stats only here — the claims are recorded at the
        // END of the batch for the docs that actually LANDED (see the
        // `claim` call below), so refcounts track corpus residency and
        // eraseDocs can always release them. The flat 8-byte store keeps
        // the record-at-detect shape (no erasure, so residency is moot).
        val stats =
          if (bIdx.tracksClaims) bIdx.detect(modelKept, idCol, textCol)
          else bIdx.detectAndAdd(modelKept, idCol, textCol,
            ingestToken = Some(s"blk-$token"))
        modelKept.join(
          stats.filter(col("kept_blocks") > 0).select(col(idCol)),
          Seq(idCol), "left_semi")
          .transform(graft.ext.Parallelism.materialize(_))
    }
    if (afterBlocks.isEmpty) return
    // near-dup pass: novel docs are those matching nothing stored and
    // nothing earlier in the batch
    val dups = nearDupIndex.detectAndAdd(afterBlocks, idCol, textCol,
        ingestToken = Some(s"ndi-$token"))
      .select(col("id_new").as(idCol)).distinct()
    // in claims mode `novel` is consumed twice (replay anti-join + the
    // final claim) — barrier it
    val novel0 = afterBlocks.join(dups, Seq(idCol), "left_anti")
    val novel =
      if (blockIndex.exists(_.tracksClaims))
        graft.ext.Parallelism.materialize(novel0)
      else novel0
    // the curated append is idempotent too: a crash between this append
    // and the checkpoint commit redelivers the batch, and the index
    // stages replay to their original answers — without this anti-join
    // the replayed survivors would land in the corpus TWICE. Ids ascend
    // across batches (the pipeline contract), so only files written by a
    // crashed attempt of THIS batch can overlap the novel ids: the min-id
    // lower bound lets per-file stats prune the replay anti-join to the
    // crash-window files instead of a full corpus id scan per micro-batch
    // — the difference between O(batch) and O(corpus) at 100 TB.
    val fresh0 =
      if (!corpusTable.exists) novel
      else {
        val batchMin = quality.agg(min(col(idCol))).head().get(0)
        novel.join(
          corpusTable.readWhere(col(idCol) >= lit(batchMin)).select(col(idCol)),
          Seq(idCol), "left_anti")
      }
    // the survivors ALWAYS feed at least two consumers (emptiness probe +
    // corpus append; three with the lex tokenize) — barrier, or the replay
    // anti-join and its pruned corpus scan execute once per consumer
    val fresh = graft.ext.Parallelism.materialize(fresh0)
    if (!fresh.isEmpty) corpusTable.append(fresh)
    // lexical index AFTER the curated append (corpus is the source of
    // truth); its own ingest token replays idempotently, so a crash in
    // either order converges — this order just means a searcher can never
    // retrieve a doc the corpus doesn't hold yet
    lexIndex.foreach(_.add(fresh, idCol, textCol, ingestToken = Some(s"lex-$token")))
    // claims LAST, for `novel` (= this batch's corpus-resident docs: what
    // was appended now plus what a crashed attempt already appended — the
    // replay anti-join's difference is resident too, so it must claim).
    // Ordering: a crash BEFORE this line replays to the identical `novel`
    // (the claims store is unchanged, so detect() recomputes the original
    // stats) and fills the gap under the token; a crash AFTER it replays
    // into detect() seeing its own claims, which empties the batch — and
    // every earlier stage already landed. Either way the stores converge.
    blockIndex.filter(_.tracksClaims).foreach(
      _.claim(novel, idCol, textCol, claimToken = Some(s"blk-$token")))
  }

  /** Right-to-erasure / recrawl across the assembled pipeline: delete the
    * docs from the curated corpus (pruned file rewrite), tombstone them in
    * the near-dup index (so their minhash rows stop matching new batches —
    * physical removal at `nearDupIndex.purge()` maintenance cadence), and
    * — when the URL front end tracks owners ([[urlTrackOwners]]) — release
    * their canonical-URL claims so a recrawl can re-admit those URLs with
    * a new (higher-id) winner. Block hashes (`blockWords > 0`) depend on
    * the store mode: with [[blockTrackClaims]] the erased docs' block
    * claims are released from their refcounts BEFORE the corpus delete
    * (the text is the hash source, and this is its last read) — blocks
    * solely claimed by erased docs re-admit, shared blocks stay
    * suppressed, and the release is idempotent under a re-run (the remove
    * token derives from the id set). Without claim tracking the 8-byte
    * hashes stay by design: a flat block claim is shared with retained
    * docs, releasing it would re-admit duplicates they still suppress,
    * and keeping it leaks no text.
    *
    * Erasure sets are maintenance-bounded (thousands, not corpus-scale):
    * the ids are collected so the corpus delete carries a min/max range
    * conjunct the file-stats pruner understands — the delete rewrites only
    * files that can contain an erased id. Run with no ingest in flight
    * (the [[graft.ext.Tombstoned]] purge contract). */
  def eraseDocs(ids: DataFrame): Unit = {
    val distinctIds = ids.select(col(idCol)).distinct()
    // the bound is probed BEFORE the collect (the eraseVectors discipline):
    // guarding after would let an unbounded id frame stall or OOM the
    // driver before the guard could name the remedy
    require(distinctIds.limit(100001).count() <= 100000,
      "eraseDocs: erasure is a bounded maintenance operation; " +
        "run larger sets in chunks")
    val idRows = distinctIds.collect()
    if (idRows.isEmpty) return
    val idVals = idRows.map(_.get(0)).toSeq
    nearDupIndex.remove(ids.select(col(idCol)), idCol)
    urlIndex.filter(_.tracksOwners).foreach(_.remove(ids.select(col(idCol)), idCol))
    // lexical tombstones drop the docs from every BM25 ranking at once
    // (df, N, and avgdl adjust — see LexIndex); physical removal at its
    // purge() maintenance cadence
    lexIndex.foreach(_.remove(ids.select(col(idCol)), idCol))
    if (corpusTable.exists) {
      val b = ids.select(col(idCol)).agg(min(col(idCol)), max(col(idCol))).head()
      // the range conjuncts make the delete's file pruning bite on the
      // id-clustered-by-append corpus; isin keeps the row match exact
      val pred = col(idCol) >= lit(b.get(0)) && col(idCol) <= lit(b.get(1)) &&
        col(idCol).isin(idVals: _*)
      // block-claim release reads the erased docs' TEXT (the hash source)
      // through the same pruned predicate, so it must run BEFORE the
      // delete destroys it; the id-set-derived token makes a re-run after
      // a crash between release and delete a no-op instead of a
      // double-decrement
      blockIndex.filter(_.tracksClaims).foreach { bi =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val tok = "erase-" + md.digest(
            idVals.map(String.valueOf).sorted.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        bi.remove(corpusTable.readWhere(pred).select(col(idCol), col(textCol)),
          idCol, textCol, removeToken = Some(tok))
      }
      corpusTable.delete(pred)
      ()
    }
  }

  /** Checkpointed run-to-drain over a parquet document directory: each
    * AvailableNow pass ingests only files the checkpoint has not seen. */
  def runOnce(srcDir: String, schema: StructType): Unit = {
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId.toString); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Checkpointed run-to-drain over a directory of WARC crawl archives —
    * the pipeline's front door for raw crawls: each micro-batch of
    * `binaryFile` rows (one archive per row; the source's 2 GiB/file cap
    * is the crawl standard's ~1 GiB archive size) explodes to records
    * partition-locally ([[Warc.recordsExploded]] — archive bytes never
    * shuffle), keeps response/conversion records, extracts text
    * ([[TextAnalysis.htmlToText]] unless `htmlPayloads=false`), and runs
    * the full [[ingestBatch]] pipeline, with `target_uri` feeding the
    * crawl front end when `urlCol` is set.
    *
    * Doc ids are synthesized to honor the pipeline's ascending-id
    * contract AND redeliver identically on replay: a bit-pack of
    * (batchId, file index in the batch's sorted path list, record index
    * in the archive) — 18/20/25 bits. All three are deterministic for a
    * redelivered batch (the checkpoint pins the file set, paths sort,
    * record order is physical), so a crash replays to byte-identical
    * ids, which is what the index tokens and the curated anti-join key
    * on. Bounds checked loudly; 2^25 records/archive exceeds what the
    * source's 2 GiB file cap can physically hold.
    *
    * OPERATING ASSUMPTION — the 18-bit batch-id budget: one checkpoint
    * lineage supports 262,144 micro-batches. This front door is sized for
    * the batch-drop crawl model (one crawl dump = one `runOnceWarc`
    * drain, a handful of AvailableNow batches per drain — CommonCrawl
    * cadence is ~monthly), NOT a years-long continuous per-file trigger.
    * A deployment that would exceed the budget rotates checkpoints: start
    * a new `CorpusIngest` root per crawl epoch — the persisted indexes
    * carry the dedup state forward, so a fresh lineage loses nothing.
    * The guard in [[warcBatchToDocs]] fails loudly (never wraps) at the
    * boundary. */
  def runOnceWarc(srcDir: String, pathGlob: String = "*.warc*",
      htmlPayloads: Boolean = true): Unit = {
    // binaryFile's schema is FIXED by the source; the streaming reader
    // still demands it explicitly
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val q = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", pathGlob)
      .load(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(warcBatchToDocs(batch, batchId, htmlPayloads), batchId.toString); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One binaryFile micro-batch of WARC archives → the (idCol, textCol
    * [, urlCol]) doc frame [[ingestBatch]] expects. The batch's path list
    * is driver-side metadata (bounded by files-per-trigger), everything
    * row-sized stays on executors. */
  private[streaming] def warcBatchToDocs(batch: DataFrame, batchId: Long,
      htmlPayloads: Boolean): DataFrame = {
    require(batchId < (1L << 18),
      s"runOnceWarc: batchId $batchId exceeds the 18-bit id budget")
    // metadata-plane collect: file PATHS only (the reference's own driver
    // loops collect schema-level metadata the same way, cdc.py:83)
    val paths = batch.select("path").distinct().collect().map(_.getString(0)).sorted
    require(paths.length < (1 << 20),
      s"runOnceWarc: ${paths.length} archives in one batch exceeds the " +
        "20-bit id budget — cap files per trigger")
    val spark0 = batch.sparkSession
    import spark0.implicits._
    val fileIdx = paths.zipWithIndex.toSeq.toDF("path", "__file_idx")
    val recs = Warc.recordsExploded(
        batch.join(broadcast(fileIdx), Seq("path")).select(col("__file_idx"), col("content")),
        "__file_idx", "content")
      .filter(col("warc_type").isin("response", "conversion"))
    // the record budget is checked PER ROW (the other two budgets are
    // driver-side counts): archives are gzipped, so the 2 GiB binaryFile
    // cap bounds the COMPRESSED size — millions of tiny highly-compressible
    // records can exceed 2^25 decompressed, and an unchecked overflow would
    // bleed into the file-index bits, silently colliding doc ids across
    // archives (dedup winners, replay anti-joins and erase would then hit
    // the wrong documents)
    val recordIdx = when(col("record_idx") < lit(1L << 25), col("record_idx"))
      .otherwise(raise_error(concat(
        lit("runOnceWarc: record "), col("record_idx").cast("string"),
        lit(" exceeds the 25-bit per-archive id budget — split the archive"))))
    val id = (lit(batchId) * lit(1L << 45)) +
      (col("__file_idx").cast("long") * lit(1L << 25)) + recordIdx
    val text0 = col("payload").cast("string") // UTF-8 decode
    val text = if (htmlPayloads) TextAnalysis.htmlToText(text0) else text0
    val base = recs.select(id.as(idCol), text.as(textCol), col("target_uri"))
    urlCol match {
      case Some(u) => base.withColumnRenamed("target_uri", u)
      case None    => base.drop("target_uri")
    }
  }
}
