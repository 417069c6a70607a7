package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the lexical side of a retrieval tier,
  * completing the serving stack next to the vector indexes ([[AnnIndex]],
  * [[IvfIndex]], [[PqIndex]], [[IvfPqIndex]]): tokenize the corpus ONCE
  * at ingest, query many times by keyword, fuse with an ANN shortlist via
  * [[Similarity.rrfFuse]] for hybrid search.
  *
  * Layout: three [[GraftTable]]s under `path` —
  *  - `postings` (th, doc_id, tf, dl): one row per (token, document),
  *    keyed by the token's xxhash64 `th` and range-CLUSTERED on it, so a
  *    query's bounded term set IN-prunes the scan to the files whose
  *    [min,max] th range can hold a probed term — O(files holding probed
  *    terms), never O(index). The document length `dl` is DENORMALIZED
  *    into each posting (Lucene's norms-with-postings shape, +4 bytes a
  *    row): BM25's length normalization then needs NO corpus-sized join
  *    at query time.
  *  - `docs` (doc_id, dl): one slim row per ingested document, including
  *    zero-token docs — the doc-length store that lets erasure adjust the
  *    corpus stats exactly (tombstone sets are bounded between purges, so
  *    the adjustment is a broadcast semi-join against this table).
  *  - `stats` (token, n_docs, sum_dl): ONE row per ingest batch. Corpus
  *    totals (N, avgdl) at query time are a sum over #batches rows — a
  *    metadata-plane aggregate, never a corpus scan.
  * plus the shared `applied` (ingest tokens) and `removed` (tombstones)
  * tables of the [[Tombstoned]] contract.
  *
  * Document frequency is NOT a maintained table: df(t) is counted from
  * the live postings of the probed terms themselves — the pruned scan
  * already holds exactly one row per (term, doc), so `count per th` IS
  * df, always current under adds and tombstones, with nothing to keep in
  * sync (the reason the classic "df table" drifts in incremental
  * deployments).
  *
  * Scoring is the d19/d24 integer-micro portability discipline: each
  * idf and tf-normalization factor is computed in IEEE double, frozen to
  * micro units through a DECIMAL(28,6) cast, and the per-term products
  * are summed as exact BIGINTs (1e-12 units) — bit-identical on any
  * engine, hash-safe against a DuckDB mirror.
  *
  * Tokenization is [[TextAnalysis.normalize]] + whitespace split (the
  * d10 corpus-vocabulary contract), so the index, the corpus-stats
  * queries, and the BPE machinery all agree on what a token is.
  */
/** @param positions persist each term's in-document positions beside its
  *   posting (Lucene's positional-index shape, the price of PHRASE
  *   queries: the pos arrays add O(dl) ints per doc where the flat index
  *   stores O(distinct terms)). The layout is decided by the store's FIRST
  *   add — reopening an index inherits what is on disk, and a mismatch
  *   fails loudly instead of silently writing a mixed store
  *   ([[AnnIndex]]'s `storeHasTb` lesson). */
final class LexIndex(
    spark: SparkSession,
    path: String,
    positions: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {

  private[ext] val postingsTable = GraftTable(spark, s"$path/postings")
  // no file stats for docs/stats/common: all consumed whole (totals, or a
  // bounded broadcast probe) — never through a pruned read
  private[ext] val docsTable = GraftTable(spark, s"$path/docs")(
    settings.copy(collectFileStats = false))
  private[ext] val commonTable = GraftTable(spark, s"$path/common")(
    settings.copy(collectFileStats = false))
  private[ext] val statsTable = GraftTable(spark, s"$path/stats")(
    settings.copy(collectFileStats = false))
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "doc_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection points for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  /** Whether any batch has been indexed yet — a log probe (cached
    * listing), NOT a data scan. */
  def hasStore: Boolean = docsTable.exists

  def indexedCount: Long =
    if (!docsTable.exists) 0L
    else withoutTombstoned(docsTable.read(), "doc_id").count()

  /** Normalized non-empty token array of `textCol` — the d10 contract. */
  private def tokArr(textCol: String) =
    filter(split(TextAnalysis.normalize(col(textCol)), " "), t => length(t) > 0)

  /** Whether the persisted postings carry position arrays. A fresh store
    * adopts the constructor's `positions`; an existing one keeps its disk
    * layout, and a constructor mismatch is a loud error — a mixed store
    * would leave `pos` NULL on old files and silently drop their docs
    * from every phrase query. */
  private def storeHasPos: Boolean =
    if (!postingsTable.exists) positions
    else {
      val has = postingsTable.read().columns.contains("pos")
      require(has == positions,
        s"LexIndex at $path was built with positions=$has; reopen it with " +
          s"the same flag (got positions=$positions)")
      has
    }

  private def tokenApplied(token: String): Boolean =
    appliedTable.exists &&
      appliedTable.read().filter(col("token") === token).limit(1).count() > 0

  /** Tokenize and append a batch of (id, text) rows. Ids must be globally
    * unique across adds; zero-token documents still count toward N.
    *
    * Replay safety (the [[AnnIndex]]/[[IvfIndex]] contract): pass
    * `ingestToken` (e.g. the foreachBatch batchId) to make ingestion
    * IDEMPOTENT under at-least-once delivery — the token is recorded
    * BEFORE the appends, and a replayed token appends only the batch rows
    * missing from each store (each append is one atomic commit, so a
    * crash leaves whole-table gaps the anti-join fill closes exactly,
    * never double-counting a posting or a stats row). */
  def add(df: DataFrame, idCol: String, textCol: String,
      ingestToken: Option[String] = None): Unit = {
    import spark.implicits._
    val replay = ingestToken.exists(tokenApplied)
    // tombstoned ids never (re-)enter the index: a late or replayed batch
    // carrying an id removed in the meantime must not resurrect it
    val in = withoutTombstoned(df, idCol)
    // one tokenization pass, materialized: postings AND docs both derive
    // from it (the explode must not re-run the normalize regex per store).
    // Widened first — a batch delivered as few fat files would otherwise
    // run the normalize regex + explode on as few cores
    val base = Parallelism.materialize(
      Parallelism.widen(in).select(col(idCol).as("doc_id"), tokArr(textCol).as("__toks")))
    val docs0 = base.select(col("doc_id"), size(col("__toks")).cast("int").as("dl"))
    // batch stats: ONE driver-side row (metadata-plane, like every index's
    // schema probe) — the totals store that keeps N/avgdl off the corpus.
    // Computed FIRST so it doubles as the emptiness probe: an empty batch
    // (streaming no-op delivery, or fully tombstoned) is a no-op without a
    // separate isEmpty job — an unrecorded token just re-noops on
    // redelivery.
    val s0 = docs0.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    if (s0.getLong(0) == 0L) return
    // (doc_id, token, tf, dl[, pos]) in ONE aggregation: dl is functionally
    // dependent on doc_id, so carrying it through the groupBy keys is free
    // — no second shuffle to re-attach document lengths. Positional mode
    // swaps explode for posexplode and collects each term's sorted
    // in-document offsets (O(dl) ints per doc — the phrase-query price).
    val withPos = storeHasPos
    val postings0 = Parallelism.materialize( // appendClustered's range sampler would re-run the explode
      if (withPos)
        base.select(col("doc_id"), size(col("__toks")).cast("int").as("dl"),
            posexplode(col("__toks")).as(Seq("__pos", "__tok")))
          .groupBy(col("doc_id"), col("dl"), col("__tok"))
          .agg(count(lit(1)).cast("int").as("tf"),
            sort_array(collect_list(col("__pos").cast("int"))).as("pos"))
          .select(xxhash64(col("__tok")).as("th"), col("doc_id"), col("tf"),
            col("dl"), col("pos"))
      else
        base.select(col("doc_id"), size(col("__toks")).cast("int").as("dl"),
            explode(col("__toks")).as("__tok"))
          .groupBy(col("doc_id"), col("dl"), col("__tok"))
          .agg(count(lit(1)).cast("int").as("tf"))
          .select(xxhash64(col("__tok")).as("th"), col("doc_id"), col("tf"), col("dl")))
    val stats0 = Seq((ingestToken.orNull, s0.getLong(0), s0.getLong(1)))
      .toDF("token", "n_docs", "sum_dl")
    // token recorded BEFORE the appends (the shared index ordering): a
    // crash in between leaves a gap the replay path fills idempotently
    ingestToken.filter(_ => !replay).foreach { t =>
      appliedTable.append(Seq(Tuple1(t)).toDF("token"))
    }
    failpoints.hit("after-token")
    val (postings, docs, statsMissing) =
      if (!replay) (postings0, docs0, true)
      else {
        // rare path: per-store anti-join against CURRENT content — a
        // completed first attempt re-appends nothing, a crash gap only its
        // missing rows (appends are atomic commits, so gaps are per-table)
        def missingFrom(t: GraftTable, rows: DataFrame): DataFrame =
          if (!t.exists) rows
          else rows.join(t.read().select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
        val sm = !statsTable.exists || ingestToken.forall { tk =>
          statsTable.read().filter(col("token") === tk).limit(1).count() == 0
        }
        (missingFrom(postingsTable, postings0), missingFrom(docsTable, docs0), sm)
      }
    // postings range-clustered on th so query-time IN-pruning works; docs
    // and stats append flat (consumed whole, never pruned)
    if (!replay || postings.limit(1).count() > 0)
      postingsTable.appendClustered(postings, Seq("th"))
    failpoints.hit("after-postings")
    if (!replay || docs.limit(1).count() > 0)
      docsTable.append(docs)
    failpoints.hit("after-docs")
    if (statsMissing) statsTable.append(stats0)
    // store maintenance: thousands of ingest batches must not accumulate
    // unbounded small files; the postings compaction re-clusters so the
    // th ranges stay tight and IN-pruning survives the rewrite
    postingsTable.compactClusteredIfNeeded(Seq("th"))
    docsTable.compactIfNeeded()
    statsTable.compactIfNeeded()
  }

  /** Live corpus totals (N, sum dl): the stats-table sum, minus the
    * tombstoned docs' contribution (bounded between purges — a broadcast
    * semi-join against the slim docs table, never a postings scan). */
  private def liveTotals(): (Long, Long) = {
    val t0 = statsTable.read()
      .agg(coalesce(sum(col("n_docs")), lit(0L)), coalesce(sum(col("sum_dl")), lit(0L)))
      .head()
    val (n0, s0) = (t0.getLong(0), t0.getLong(1))
    tombstones.fold((n0, s0)) { r =>
      val a = docsTable.read()
        .join(Parallelism.maybeBroadcast(
            r.withColumnRenamed(tombstoneIdCol, "doc_id"),
            settings.probeBroadcastThresholdBytes),
          Seq("doc_id"), "left_semi")
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      (n0 - a.getLong(0), s0 - a.getLong(1))
    }
  }

  /** Refresh the high-document-frequency term list — the stopword scale
    * guard: the pruned-scan bound of [[search]] is O(files holding probed
    * terms), which a STOP WORD breaks (its postings are a constant
    * fraction of the corpus — scanning them costs a corpus-sized read for
    * a term whose idf contributes ≈ ln(1 + ~0) ≈ nothing to the ranking).
    * This maintenance pass scans the postings ONCE, persists every term
    * hash whose live df ≥ `minDfPpm` parts-per-million of N (a bounded
    * list: natural-language vocabularies hold a few hundred such terms —
    * guarded loudly at 65,536), and `search(skipCommon = true)` then
    * drops those terms from the query BEFORE the key-set collect, so
    * their postings are never scanned. Semantics are exact and explicit:
    * skipping a query term equals searching a query without it — N,
    * avgdl, and every other term's df are untouched. Re-run at the same
    * cadence as [[Tombstoned.purge]]; staleness only moves terms across
    * the df boundary, never corrupts a score. */
  def refreshCommonTerms(minDfPpm: Long = 10000L): Unit = {
    require(minDfPpm > 0, s"minDfPpm must be positive, got $minDfPpm")
    require(postingsTable.exists, s"empty lexical index at $path")
    val (n, _) = liveTotals()
    require(n > 0, s"lexical index at $path holds no live documents")
    val floor = math.max(1L, minDfPpm * n / 1000000L)
    val common = Parallelism.materialize(
      withoutTombstoned(postingsTable.read(), "doc_id")
        .groupBy(col("th")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= floor))
    val rows = common.limit(65537).count()
    require(rows <= 65536,
      s"refreshCommonTerms: $rows terms above $minDfPpm ppm df — raise the " +
        "threshold; a common-term list this size means the tokenizer is " +
        "degenerate, not that the corpus has 65k stop words")
    commonTable.overwrite(common)
    ()
  }

  /** BM25 top-`k` against everything added so far. `queries` is any
    * (id, text) frame; its DISTINCT normalized tokens are the query terms
    * (query-side tf is deliberately ignored — the short-query standard).
    * Returns (query_id, doc_id, rnk, score_pico) where `score_pico` is
    * the exact-BIGINT BM25 score in 1e-12 units:
    * Σ_t micro(ln(1 + (N−df+0.5)/(df+0.5))) · micro(tf·(k1+1) / (tf +
    * k1·(1−b+b·dl/avgdl))), ties broken on doc_id.
    *
    * Scale shape: the query batch's bounded term set is collected
    * driver-side (capped at `settings.annPruneMaxKeys`, past which a
    * degrade path scans the postings without the isin-literal plan cost),
    * IN-prunes the clustered postings scan, and broadcasts into the
    * candidate join — the stored side never shuffles, df comes from the
    * pruned rows themselves, and dl rides the postings, so NO corpus-
    * sized frame is touched beyond the pruned scan.
    *
    * `excludeSelf` drops candidates whose doc_id equals the query id
    * BEFORE ranking (more-like-this retrieval, where queries are corpus
    * documents) — lower-ranked docs fill in, like tombstones.
    *
    * `skipCommon` drops query terms on the [[refreshCommonTerms]] list
    * before the term-set collect and the pruned scan — exactly equal to
    * querying without those words, and the reason a stop-word-laden query
    * stays O(rare-term files) instead of O(corpus). */
  def search(queries: DataFrame, idCol: String, textCol: String, k: Int,
      excludeSelf: Boolean = false, skipCommon: Boolean = false,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(postingsTable.exists, s"empty lexical index at $path")
    require(k >= 1, s"k must be >= 1, got $k")
    val qTerms1 = queries
      .select(col(idCol).as("query_id"), explode(tokArr(textCol)).as("__tok"))
      .distinct()
      .withColumn("th", xxhash64(col("__tok")))
      .drop("__tok")
    val qTerms0 =
      if (!skipCommon) qTerms1
      else {
        require(commonTable.exists,
          s"skipCommon needs refreshCommonTerms() to have run for $path")
        // the common list is bounded (≤65,536 rows) — broadcast anti-join
        qTerms1.join(broadcast(commonTable.read().select(col("th"))),
          Seq("th"), "left_anti")
      }
    // consumed twice (key-set collect + candidate join): query batches are
    // probe-sized by contract, so the barrier is cheap
    val qTerms = Parallelism.materialize(qTerms0)
    // tombstoned docs drop BEFORE df counting and ranking, so both the
    // scores and the top-k equal a store physically without those rows.
    // Materialized: the pruned slice (only probed terms' postings) feeds
    // TWO consumers — the df count and the candidate join.
    val stored = prunedLivePostings(qTerms)
    // df per probed term from the pruned rows themselves: one row per
    // (term, doc) makes count == document frequency, always current
    val dfs = stored.groupBy(col("th")).agg(count(lit(1)).as("df"))
    val (n, sumDl) = liveTotals()
    require(n > 0, s"lexical index at $path holds no live documents")
    val avgdl = sumDl.toDouble / n
    val joined0 = stored
      .join(Parallelism.maybeBroadcast(qTerms,
        settings.probeBroadcastThresholdBytes), Seq("th"))
    val joined = if (excludeSelf) joined0.filter(col("doc_id") =!= col("query_id")) else joined0
    // the d24 freeze: each factor double -> DECIMAL(28,6) -> micro BIGINT,
    // products and sums exact integer math from here on
    def micro(x: org.apache.spark.sql.Column) =
      (x.cast("decimal(28,6)") * lit(1000000)).cast("long")
    val idf = micro(log(lit(1.0) +
      (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))))
    val tfn = micro((col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / lit(avgdl)))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_pico").desc, col("doc_id"))
    joined
      // df is #probed-terms rows — broadcast into the scoring join
      .join(broadcast(dfs), Seq("th"))
      .withColumn("__term_pico", idf * tfn)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__term_pico")).as("score_pico"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "score_pico")
  }

  /** The pruned live postings for a term-hash frame: bounded key-set
    * collect → IN-pruned clustered scan (degrade to the full scan past
    * `settings.annPruneMaxKeys` — still a broadcast candidate join, no
    * stored-side shuffle, just no file pruning, the AnnIndex trade) →
    * tombstone anti-join. Materialized — every caller consumes it more
    * than once. */
  private def prunedLivePostings(qTerms: DataFrame): DataFrame = {
    val maxKeys = settings.annPruneMaxKeys
    val probeKeys = qTerms.select(col("th")).distinct()
      .limit(maxKeys + 1).collect().map(_.getLong(0))
    val stored0 =
      if (probeKeys.length <= maxKeys)
        postingsTable.readWhere(col("th").isin(probeKeys.toSeq: _*))
      else postingsTable.read()
    Parallelism.materialize(withoutTombstoned(stored0, "doc_id"))
  }

  /** Exact PHRASE top-`k` (needs `positions = true`): each query text is
    * one phrase — its normalized tokens in order — and a document matches
    * where ALL phrase terms occur at consecutive positions. Returns
    * (query_id, doc_id, rnk, n_matches): docs ranked by occurrence count
    * (ties on doc_id), one row per matching doc only.
    *
    * The classic positional-intersection, expressed relationally with no
    * UDFs: a posting's position `p` for the phrase's offset-`o` term
    * votes for start `p − o`; a start with votes from EVERY offset is a
    * full phrase occurrence (duplicate phrase tokens just vote from two
    * offsets). Engine-portable — integer arithmetic and counts only.
    *
    * Scale shape: same IN-pruned postings scan as [[search]] (phrase
    * terms are the probe set); the vote explode is bounded by the matched
    * postings' tf sums, grouped per (query, doc, start) with map-side
    * combine. Stop-word-laden phrases pay that term's postings scan — the
    * [[refreshCommonTerms]] skip CANNOT apply here (dropping a phrase
    * word changes phrase semantics), which is the standard positional-
    * index trade. */
  def phraseSearch(queries: DataFrame, idCol: String, textCol: String, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    require(postingsTable.exists, s"empty lexical index at $path")
    require(storeHasPos,
      s"phraseSearch needs a positional index — build LexIndex at $path " +
        "with positions=true")
    require(k >= 1, s"k must be >= 1, got $k")
    // (query_id, off, th): offsets matter and duplicate tokens keep BOTH
    // offset rows — no distinct here, unlike search()
    val qTerms = Parallelism.materialize(
      queries.select(col(idCol).as("query_id"),
          posexplode(tokArr(textCol)).as(Seq("__off", "__tok")))
        .select(col("query_id"), col("__off").cast("int").as("off"),
          xxhash64(col("__tok")).as("th")))
    // phrase length per query — one tiny frame, broadcast into the gate
    val qLen = qTerms.groupBy(col("query_id"))
      .agg((max(col("off")) + lit(1)).as("plen"))
    val stored = prunedLivePostings(qTerms)
    val joined0 = stored.join(Parallelism.maybeBroadcast(qTerms,
      settings.probeBroadcastThresholdBytes), Seq("th"))
    val joined = if (excludeSelf) joined0.filter(col("doc_id") =!= col("query_id")) else joined0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_matches").desc, col("doc_id"))
    joined
      .select(col("query_id"), col("doc_id"), col("off"),
        explode(col("pos")).as("__p"))
      .select(col("query_id"), col("doc_id"), col("off"),
        (col("__p") - col("off")).as("start"))
      .filter(col("start") >= 0)
      // one vote per (query, doc, start, offset); a start backed by every
      // phrase offset is a full occurrence
      .groupBy(col("query_id"), col("doc_id"), col("start"))
      .agg(count(lit(1)).as("__votes"))
      .join(broadcast(qLen), Seq("query_id"))
      .filter(col("__votes") === col("plen"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "rnk", "n_matches")
  }

  /** [[Tombstoned.purge]]'s store rewrite: drops the removed docs'
    * postings (re-clustered on th so IN-pruning survives), their docs
    * rows, and rewrites the stats table to ONE consolidated row re-derived
    * from the kept docs — totals stay exact across any number of
    * purge/add cycles. */
  protected def purgeRewrite(removedIds: DataFrame): Unit = {
    import spark.implicits._
    val rb = Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes)
    if (postingsTable.exists) {
      val kept = Parallelism.materialize(
        postingsTable.read().join(rb, Seq("doc_id"), "left_anti"))
      postingsTable.overwrite(
        kept.repartitionByRange(math.max(1, postingsTable.liveFiles().size),
          col("th")).sortWithinPartitions("th"))
    }
    if (docsTable.exists) {
      val kept = Parallelism.materialize(
        docsTable.read().join(rb, Seq("doc_id"), "left_anti"))
      docsTable.overwrite(kept)
      val s = kept.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      statsTable.overwrite(
        Seq(("purged", s.getLong(0), s.getLong(1))).toDF("token", "n_docs", "sum_dl"))
    }
  }
}
