package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) approximate-nearest-neighbor index — the
  * second scale path beside [[AnnIndex]]'s LSH, with the trade-off LSH
  * banding can't express: recall tunes with `nProbe`/`nLists` independently
  * of corpus size (the classic FAISS IVF workflow: train a coarse
  * quantizer once, ingest forever, probe a few cells per query).
  *
  * Layout: two [[GraftTable]]s under `path` —
  *  - `centroids` (list_id, cvec): the coarse-quantizer codebook, written
  *    ONCE by [[train]] and broadcast into every assignment (nLists rows —
  *    KB-sized regardless of corpus size);
  *  - `cells` (vec_id, vec, sq, list_id): each ingested vector with its
  *    pre-quantized squared norm, assigned to its nearest centroid's cell
  *    and range-CLUSTERED on `list_id`, so each data file covers a tight
  *    cell range and per-file min/max stats make a probe's cell set
  *    file-prunable. Unlike the LSH layout (bucket rows separate from
  *    vectors — a vector appears in nTables buckets), IVF assigns each
  *    vector to exactly ONE cell, so the payload co-locates with the cell
  *    id and a query is a single pruned scan, no second vector join.
  *
  * [[add]] assigns only the new batch (centroids broadcast; the batch's
  * shuffle carries one small struct per vector, never embeddings — see
  * [[Similarity.ivfAssign]]) and appends clustered. [[query]] assigns the
  * probes to their `nProbe` closest cells, collects the bounded cell-id
  * set (≤ nLists values by construction — no degrade threshold needed,
  * unlike the LSH key set), file-prunes the cells store with
  * `readWhere(list_id IN ...)`, and broadcasts the probe rows into the
  * candidate join — the stored table never shuffles, and the scan is
  * O(files holding a probed cell) ≈ nProbe/nLists of the index.
  *
  * Results equal the one-shot [[Similarity.ivfTopK]] over the union of all
  * adds when trained on the same corpus (same codebook, same quantized
  * scoring) — the property the catalog oracle checks.
  */
final class IvfIndex(
    spark: SparkSession,
    path: String)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {

  private[ext] val centroidsTable = GraftTable(spark, s"$path/centroids")
  private[ext] val cellsTable = GraftTable(spark, s"$path/cells")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "vec_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  def isTrained: Boolean = centroidsTable.exists

  def indexedCount: Long =
    if (!cellsTable.exists) 0L
    else withoutTombstoned(cellsTable.read(), "vec_id").count()

  private def tokenApplied(token: String): Boolean =
    appliedTable.exists &&
      appliedTable.read().filter(col("token") === token).limit(1).count() > 0

  private def centroids(): DataFrame =
    centroidsTable.read().select(col("list_id"), col("cvec"))

  /** The trained dimensionality — one metadata-plane row off the KB-sized
    * codebook, observed ONCE per instance: the codebook is immutable after
    * train() (re-training refuses), so each later add/query skips the
    * probe job. */
  @volatile private var dimsCache: Option[Int] = None
  private def trainedDims(): Int = dimsCache.getOrElse {
    val d = centroids().agg(max(size(col("cvec")))).head().getInt(0)
    dimsCache = Some(d)
    d
  }

  /** Mismatched or ragged vectors against the trained codebook would
    * silently corrupt cell assignments (the quantized dot iterates the
    * LEFT array's length, so a longer batch vector reads past the
    * centroid and a shorter one truncates — garbage cells, no error) —
    * fail loudly instead (the [[Similarity.pqTopK]] contract). */
  /** Validates dims, returning false when `df` is EMPTY — the aggregate
    * that sizes the vectors doubles as the emptiness probe, so callers
    * skip a separate `isEmpty` job per ingest/query. */
  private def checkDims(df: DataFrame, vecCol: String, what: String,
      expect: Option[Int]): Boolean = {
    val d = df.agg(min(size(col(vecCol))), max(size(col(vecCol))),
      count(lit(1)), count(col(vecCol))).head()
    if (d.getLong(2) == 0L) return false
    // min/max skip NULLs: a NULL-vector row in a non-empty frame must fail
    // loudly, not masquerade as an empty (no-op) batch
    require(d.getLong(3) == d.getLong(2),
      s"IvfIndex: ${d.getLong(2) - d.getLong(3)} NULL $what vectors")
    require(d.getInt(0) == d.getInt(1),
      s"IvfIndex: ragged $what vectors (dims ${d.get(0)}..${d.get(1)})")
    expect.foreach(e => require(d.getInt(0) == e,
      s"IvfIndex: $what dims ${d.getInt(0)} != trained dims $e"))
    true
  }

  /** Fit the coarse quantizer: `nLists` deterministic md5-sampled corpus
    * vectors (see [[Similarity.ivfCentroids]]) persisted as the codebook.
    * Train ONCE, before the first [[add]] — every later assignment reuses
    * this codebook, which is what keeps incremental ingestion equal to the
    * one-shot operator (and is how production IVF works: retraining the
    * quantizer means rebuilding the index). */
  def train(corpus: DataFrame, idCol: String, vecCol: String, nLists: Int): Unit = {
    require(!isTrained, s"IvfIndex at $path is already trained")
    require(checkDims(corpus, vecCol, "corpus", None),
      s"IvfIndex: empty training corpus")
    centroidsTable.append(
      Similarity.ivfCentroids(corpus, idCol, vecCol, nLists)
        .select(col("list_id"), col("cvec")))
  }

  /** Assign and append a batch of (id, vector) rows. Ids must be globally
    * unique across adds.
    *
    * Replay safety (the [[AnnIndex]]/[[NearDupIndex]] contract): pass
    * `ingestToken` (e.g. the foreachBatch batchId) to make ingestion
    * IDEMPOTENT under at-least-once delivery — the token is recorded
    * BEFORE the append, so a crash in between leaves a gap a replayed
    * token fills by appending only the batch rows missing from the store,
    * never double-inserting. */
  /** `attrCols` persists metadata columns (e.g. a label, a language, a
    * quality tier) alongside each vector, enabling [[query]]'s
    * `corpusFilter` — hybrid (filtered) search against the index. Every
    * add must carry the SAME attr set (the store's schema is fixed by the
    * first add; a mismatch fails loudly at append). */
  def add(df: DataFrame, idCol: String, vecCol: String,
      ingestToken: Option[String] = None,
      attrCols: Seq[String] = Nil): Unit = {
    import spark.implicits._
    require(isTrained, s"IvfIndex at $path is untrained — call train() first")
    // attr names must not shadow the store's internal columns (or the
    // id/vec inputs): on the FIRST add a collision would silently produce
    // a duplicate/ambiguous column (the drift guard's set-subtraction then
    // hides it), surfacing later as confusing resolution errors
    val reserved = Set("vec_id", "vec", "sq", "list_id", idCol, vecCol)
    val clash = attrCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"IvfIndex: attrCols ${clash.mkString(", ")} collide with reserved/input columns $reserved")
    require(attrCols.distinct == attrCols,
      s"IvfIndex: duplicate attrCols in ${attrCols.mkString(", ")}")
    val replay = ingestToken.exists(tokenApplied)
    // tombstoned ids never (re-)enter the index; empty batches (streaming
    // no-op delivery, or fully tombstoned) are a no-op — an unrecorded
    // token just re-noops on redelivery
    val in = withoutTombstoned(df, idCol)
    if (!checkDims(in, vecCol, "batch", Some(trainedDims()))) return
    // attr drift guard: the lake layer tolerates a MISSING column (reads
    // as NULL), which here would silently hide the row from every filtered
    // query — require the exact persisted attr set instead
    if (cellsTable.exists) {
      val stored = cellsTable.read().columns.toSet -- Set("vec_id", "vec", "sq", "list_id")
      require(stored == attrCols.toSet,
        s"IvfIndex: attrCols ${attrCols.toSet} != persisted attr columns $stored")
    }
    val assigned = Similarity.ivfAssign(in, idCol, vecCol, centroids())
      .select(col("id").as("vec_id"), col("list_id"))
    // materialize before clustering: repartitionByRange SAMPLES its child
    // to pick range bounds, so an unmaterialized assignment pipeline would
    // run twice (sample pass + write pass)
    val rows0 = Parallelism.materialize(
      in.select((Seq(col(idCol).as("vec_id"), col(vecCol).as("vec"),
          Similarity.quantizedDot(col(vecCol), col(vecCol)).as("sq")) ++
          attrCols.map(col)): _*)
        .join(assigned, Seq("vec_id")))
    ingestToken.filter(_ => !replay).foreach { t =>
      appliedTable.append(Seq(Tuple1(t)).toDF("token"))
    }
    failpoints.hit("after-token")
    val rows =
      if (!replay || !cellsTable.exists) rows0
      else Parallelism.materialize( // rare path: fill the crash gap only
        rows0.join(cellsTable.read().select(col("vec_id")), Seq("vec_id"), "left_anti"))
    if (!replay || rows.limit(1).count() > 0)
      cellsTable.appendClustered(rows, Seq("list_id"))
    // store maintenance: compaction stays CLUSTERED so the list_id ranges
    // remain tight and query-time IN-pruning survives the rewrite
    cellsTable.compactClusteredIfNeeded(Seq("list_id"))
  }

  /** [[Tombstoned.purge]]'s store rewrite: re-clusters on `list_id` so
    * query-time cell pruning survives the purge. */
  protected def purgeRewrite(removedIds: DataFrame): Unit =
    if (cellsTable.exists) {
      val kept = Parallelism.materialize(
        cellsTable.read().join(
          Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes),
          Seq("vec_id"), "left_anti"))
      cellsTable.overwrite(
        kept.repartitionByRange(math.max(1, cellsTable.liveFiles().size),
          col("list_id")).sortWithinPartitions("list_id"))
    }

  /** Approximate top-k against everything added so far, searching each
    * probe's `nProbe` closest cells. Returns (probe_id, neighbor_id, rnk,
    * sim). Probes sharing an id with an indexed vector exclude that
    * self-match. */
  /** `corpusFilter` is hybrid (filtered) search in its PRE-filter shape
    * (see [[Similarity.ivfTopK]]): a predicate over `attrCols` persisted
    * at [[add]] time, applied to the cell-pruned scan BEFORE candidate
    * ranking — so top-k ranks among survivors, and the predicate reaches
    * the parquet scan (PushedFilters / row-group stats) of the pruned
    * files: metadata-selective queries skip non-probed cells AND
    * non-matching row groups without touching a vector. */
  def query(probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 3, corpusFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(cellsTable.exists, s"empty IVF index at $path")
    // empty probe frame: empty result, same schema (the assignment itself
    // needs at least one row to size vectors)
    if (!checkDims(probes, vecCol, "probe", Some(trainedDims())))
      return probes
        .select(col(idCol).as("probe_id"), col(idCol).as("neighbor_id"))
        .withColumn("rnk", lit(1)).withColumn("sim", lit(0.0))
        .limit(0)
    // probe batches are usually small (they broadcast below, size-gated):
    // assigning them twice (cell-set collect + candidate join) beats a
    // barrier job
    val probeLists = Similarity.ivfAssign(probes, idCol, vecCol, centroids(), topN = nProbe)
      .select(col("id").as("probe_id"), col("list_id"))
    // bounded driver-side set (≤ nLists values — the codebook is tiny by
    // construction, so no LSH-style degrade threshold is needed); the
    // pruned read scans only files whose [min,max] list range can hold a
    // probed cell, never the whole index
    val lists = probeLists.select("list_id").distinct().collect().map(_.getInt(0))
    val stored0 = cellsTable.readWhere(col("list_id").isin(lists.toSeq: _*))
    val stored = corpusFilter.map(stored0.filter).getOrElse(stored0)
    // probe cell-memberships broadcast into the pruned scan; the payload
    // co-locates with the cell id, so candidates carry their vectors out
    // of the SAME scan — no second stored-side join, zero stored shuffle
    val cand0 = stored
      .join(Parallelism.maybeBroadcast(probeLists,
        settings.probeBroadcastThresholdBytes), Seq("list_id"))
      .filter(col("vec_id") =!= col("probe_id"))
    // tombstoned ids drop out BEFORE ranking (the AnnIndex.remove
    // semantics); tombstone sets are bounded between purges → broadcast
    val cand = withoutTombstoned(cand0, "vec_id")
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("vec").as("neighbor_vec"), col("sq").as("neighbor_sq"))
    val probeVecs = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      Similarity.quantizedDot(col(vecCol), col(vecCol)).as("probe_sq"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(Parallelism.maybeBroadcast(probeVecs,
        settings.probeBroadcastThresholdBytes), Seq("probe_id"))
      .withColumn("sim",
        Similarity.quantizedDot(col("probe_vec"), col("neighbor_vec")).cast("double") /
          sqrt(col("probe_sq").cast("double") * col("neighbor_sq").cast("double")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }
}
