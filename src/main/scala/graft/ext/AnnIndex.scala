package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted approximate-nearest-neighbor index — similarity search at
  * corpus scale means hashing the corpus ONCE and querying many times,
  * not re-bucketing 100 TB of embeddings per query batch.
  *
  * Layout: two [[GraftTable]]s under `path` — `buckets` (vec_id, tbl,
  * bucket, tb) from multi-table hyperplane LSH, range-CLUSTERED on the
  * composite key `tb = tbl << 32 | bucket` so each data file covers a
  * tight bucket range, and `vectors` (vec_id, vec, sq) with the
  * pre-quantized squared norm. `add` hashes only
  * the new batch and appends; `query` hashes only the probes, collects
  * their bounded bucket-key set (|probes| × nTables values), and
  * file-prunes the stored buckets with `readWhere(tb IN ...)` — the
  * scan is O(files that can hold a probed bucket), not O(index). The
  * probe rows are broadcast into the candidate join and the candidate
  * ids are broadcast-semi-joined into the vectors scan, so neither
  * stored table ever shuffles. Incremental growth and querying compose:
  * a crawl pipeline alternates add/query freely.
  */
final class AnnIndex(
    spark: SparkSession,
    path: String,
    nTables: Int = 8,
    bitsPerTable: Int = 6,
    portable: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {

  private[ext] val bucketsTable = GraftTable(spark, s"$path/buckets")
  // no file stats for vectors: query() reaches them through a broadcast
  // semi-join on candidate ids (never a pruned read), so a stats pass
  // would re-read the full embedding payload per append for nothing
  private[ext] val vectorsTable = GraftTable(spark, s"$path/vectors")(
    settings.copy(collectFileStats = false))
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "vec_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection points for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  def indexedCount: Long =
    if (!vectorsTable.exists) 0L
    else withoutTombstoned(vectorsTable.read(), "vec_id").count()

  /** Whether any batch has been indexed yet — a log probe (cached
    * listing), NOT a data scan; the pre-first-batch guard for callers
    * that query before adding (e.g. ingest-time semantic dedup). */
  def hasStore: Boolean = bucketsTable.exists

  /** The store's vector width memo, KEYED TO THE VECTORS TABLE VERSION:
    * dims are immutable while the store holds rows (every add requires
    * equality against the stored width), but a purge — possibly through a
    * DIFFERENT AnnIndex instance, or an external rewrite — can empty the
    * store and re-open the width. Keying the memo to the version means a
    * foreign store change is re-probed instead of validated against a
    * stale width (the silent bucket-mismatch this check exists to stop);
    * this instance's own appends refresh the memo for free (the width it
    * just proved, at the version it just produced), so the steady state
    * still pays zero probe jobs. */
  @volatile private var dimsCache: Option[(Long, Int)] = None

  /** Dimensionality of the stored vectors (one row), or None on an empty
    * index. */
  private def storedDims(): Option[Int] = {
    val v = vectorsTable.version
    dimsCache match {
      case Some((cv, d)) if cv == v => Some(d)
      case _ =>
        val d =
          if (!vectorsTable.exists) None
          else vectorsTable.read().limit(1).select(size(col("vec")))
            .collect().headOption.map(_.getInt(0))
        d.foreach(dd => dimsCache = Some((v, dd)))
        d
    }
  }

  /** The LSH hyperplanes are sized from the input's own dimensionality,
    * so a batch (or probe set) whose dims differ from the store's would
    * hash against a DIFFERENT hyperplane set — incompatible buckets that
    * silently never match. Fail loudly instead (the [[IvfIndex]] /
    * [[PqIndex]] contract). */
  /** Validates dims, returning the validated width — or None when `df` is
    * EMPTY — so the aggregate that sizes the vectors doubles as the
    * emptiness probe AND feeds the hashers' `knownDims` (callers skip
    * both a separate `isEmpty` job and the hash path's LIMIT-1 probe). */
  private def checkDims(df: DataFrame, vecCol: String, what: String): Option[Int] = {
    val d = df.agg(min(size(col(vecCol))), max(size(col(vecCol))),
      count(lit(1)), count(col(vecCol))).head()
    if (d.getLong(2) == 0L) return None
    // min/max skip NULLs, so an all-NULL (or partly-NULL) vector column in a
    // NON-empty frame must not masquerade as emptiness — that would silently
    // no-op the ingest / empty the query instead of failing loudly
    require(d.getLong(3) == d.getLong(2),
      s"AnnIndex: ${d.getLong(2) - d.getLong(3)} NULL $what vectors")
    require(d.getInt(0) == d.getInt(1),
      s"AnnIndex: ragged $what vectors (dims ${d.get(0)}..${d.get(1)})")
    storedDims().foreach(e => require(d.getInt(0) == e,
      s"AnnIndex: $what dims ${d.getInt(0)} != indexed dims $e"))
    Some(d.getInt(0))
  }

  private def tokenApplied(token: String): Boolean =
    appliedTable.exists &&
      appliedTable.read().filter(col("token") === token).limit(1).count() > 0

  /** Composite bucket key: table id in the high 32 bits, bucket id in the
    * low — one orderable long, so range clustering + min/max file stats
    * prune a multi-point probe (a two-column (tbl, bucket) pair can't
    * carry joint per-file stats; the composite can). */
  private def tbExpr = col("tbl").cast("long") * lit(1L << 32) + col("bucket").cast("long")

  /** Whether the persisted buckets store carries the `tb` column. An
    * index written by the pre-`tb` layout must keep its flat shape —
    * mixing would leave tb NULL on old files, and the pruning filter
    * would silently drop every pre-upgrade row from results. A fresh
    * store always adopts the clustered layout. */
  private def storeHasTb: Boolean =
    !bucketsTable.exists || bucketsTable.read().columns.contains("tb")

  /** Hash and append a batch of (id, vector) rows. Ids must be globally
    * unique across adds.
    *
    * Replay safety (the [[NearDupIndex]]/[[BlockDedupIndex]] contract):
    * pass `ingestToken` (e.g. the foreachBatch batchId) to make ingestion
    * IDEMPOTENT under at-least-once delivery — a replayed add would
    * otherwise DOUBLE-INSERT its rows, and duplicate vector rows turn
    * into duplicate rescore rows in every later `query`. A replayed
    * token appends only the batch rows missing from each store (filling
    * a crash gap between the two appends without double-inserting). */
  def add(df: DataFrame, idCol: String, vecCol: String,
      ingestToken: Option[String] = None): Unit = {
    import spark.implicits._
    val replay = ingestToken.exists(tokenApplied)
    val clustered = storeHasTb
    // tombstoned ids never (re-)enter the index: a late or replayed batch
    // carrying an id removed in the meantime must not resurrect it
    val in = withoutTombstoned(df, idCol)
    // empty batch (streaming no-op delivery, or fully tombstoned): nothing
    // to hash — and the hash derivation needs a row to size vectors. An
    // unrecorded token just re-noops on redelivery.
    val batchDims = checkDims(in, vecCol, "batch")
    if (batchDims.isEmpty) return
    // materialize before clustering: repartitionByRange SAMPLES its child
    // to pick range bounds, so an unmaterialized hash pipeline would run
    // twice (sample pass + write pass)
    val hashed = Similarity.lshBucketRows(in, idCol, vecCol, nTables, bitsPerTable, portable,
        knownDims = batchDims)
      .select(col("id").as("vec_id"), col("tbl"), col("bucket"))
    val buckets0 = (if (clustered) hashed.withColumn("tb", tbExpr) else hashed)
      .transform(Parallelism.materialize(_))
    val vectors0 = in.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      Similarity.quantizedDot(col(vecCol), col(vecCol)).as("sq"))
    // token recorded BEFORE the appends (the shared index ordering): a
    // crash in between leaves a gap the replay path fills idempotently
    ingestToken.filter(_ => !replay).foreach { t =>
      appliedTable.append(Seq(Tuple1(t)).toDF("token"))
    }
    failpoints.hit("after-token")
    val (buckets, vectors) =
      if (!replay) (buckets0, vectors0)
      else {
        // rare path: per-store anti-join against the CURRENT content, so a
        // completed first attempt re-appends nothing and a crash gap only
        // its missing rows
        def missingFrom(t: GraftTable, rows: DataFrame): DataFrame =
          if (!t.exists) rows
          else rows.join(t.read().select(col("vec_id")), Seq("vec_id"), "left_anti")
        (missingFrom(bucketsTable, buckets0), missingFrom(vectorsTable, vectors0))
      }
    // buckets are range-clustered on the composite bucket key so the probe
    // predicate file-prunes (flat append on a legacy pre-tb store);
    // vectors append FLAT — they are consumed via a candidate-id
    // semi-join, and range-shuffling the full embedding payload per batch
    // would buy nothing
    if (!replay || buckets.limit(1).count() > 0) {
      if (clustered) bucketsTable.appendClustered(buckets, Seq("tb"))
      else bucketsTable.append(buckets)
    }
    failpoints.hit("after-buckets")
    if (!replay || vectors.limit(1).count() > 0)
      vectorsTable.append(vectors)
    // store maintenance: a crawl ingesting thousands of batches would
    // otherwise accumulate unbounded small files. The buckets table
    // compacts CLUSTERED so the tb ranges stay tight and query-time
    // IN-pruning survives the rewrite; dataChange=false keeps the
    // compactions invisible to incremental consumers.
    if (clustered) bucketsTable.compactClusteredIfNeeded(Seq("tb"))
    else bucketsTable.compactIfNeeded()
    vectorsTable.compactIfNeeded()
    // the store now holds this width at the version maintenance settled on
    // (checkDims proved it equals any prior content): later adds/queries
    // skip the stored-width probe until someone else moves the store
    dimsCache = batchDims.map(d => (vectorsTable.version, d))
  }

  /** [[Tombstoned.purge]]'s store rewrite: inherently touches every file
    * holding a removed row — tombstoned ids are scattered across the
    * bucket-clustered layout, so file stats cannot prune them. The
    * buckets rewrite re-clusters on `tb` so query-time IN-pruning
    * survives the purge (the compactClusteredIfNeeded lesson). */
  protected def purgeRewrite(removedIds: DataFrame): Unit = {
    // a purge can empty the store entirely, re-opening the vector width
    // for the next add — drop the per-instance width memo
    dimsCache = None
    val rb = Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes)
    if (bucketsTable.exists) {
      val kept = Parallelism.materialize(
        bucketsTable.read().join(rb, Seq("vec_id"), "left_anti"))
      if (storeHasTb)
        bucketsTable.overwrite(
          kept.repartitionByRange(math.max(1, bucketsTable.liveFiles().size),
            col("tb")).sortWithinPartitions("tb"))
      else bucketsTable.overwrite(kept)
    }
    if (vectorsTable.exists)
      vectorsTable.overwrite(
        vectorsTable.read().join(rb, Seq("vec_id"), "left_anti"))
  }

  /** Approximate top-k against everything added so far. Returns
    * (probe_id, neighbor_id, rnk, sim). Probes sharing an id with an
    * indexed vector exclude that self-match.
    *
    * `probePerturbations` is the multi-probe recall knob (Lv et al. 2007 —
    * the same expansion as [[Similarity.annTopKMultiprobe]]): each probe
    * also searches every bucket reachable by flipping one of the LOW
    * `probePerturbations` sign bits, per table. The candidate set strictly
    * contains the plain query's, so recall@k is non-decreasing — at the
    * cost of query-side candidates ONLY. The stored index neither grows
    * nor re-shuffles, which is the whole point at 100 TB: recall is tuned
    * per QUERY, not per (re)build. The expansion happens before the `tb`
    * IN-prune below, so file pruning covers the perturbed buckets too.
    * `probePerturbations = bitsPerTable` reproduces the one-shot
    * multiprobe operator exactly. */
  /** `excludeNeighbors`: optional one-column id frame whose rows are
    * dropped from the CANDIDATES before ranking (lower-ranked live
    * candidates fill in, like tombstones). The ingest-time dedup stage
    * passes the current batch's ids so a redelivered batch never matches
    * its own crashed-attempt rows — which is what makes that stage replay
    * to the clean-run answer exactly. */
  def query(probes: DataFrame, idCol: String, vecCol: String, k: Int,
      probePerturbations: Int = 0,
      excludeNeighbors: Option[DataFrame] = None): DataFrame = {
    require(bucketsTable.exists, s"empty ANN index at $path")
    require(probePerturbations >= 0 && probePerturbations <= bitsPerTable,
      s"probePerturbations=$probePerturbations outside [0, bitsPerTable=$bitsPerTable]")
    // empty probe frame: empty result, same schema (empty-in/empty-out —
    // the hash derivation itself needs at least one row to size vectors)
    val probeDims = checkDims(probes, vecCol, "probe")
    if (probeDims.isEmpty)
      return probes
        .select(col(idCol).as("probe_id"), col(idCol).as("neighbor_id"))
        .withColumn("rnk", lit(1)).withColumn("sim", lit(0.0))
        .limit(0)
    // probe batches are small by contract (they broadcast below): hashing
    // them twice (key-set collect + candidate join) beats a barrier job
    val exactBuckets = Similarity.lshBucketRows(
        probes, idCol, vecCol, nTables, bitsPerTable, portable,
        knownDims = probeDims)
      .select(col("id").as("probe_id"), col("tbl"), col("bucket"))
    // multi-probe expansion: {bucket} ∪ {bucket XOR 2^b}; flip 0 keeps the
    // exact bucket, so the expansion strictly contains the plain candidates
    val probeBuckets =
      if (probePerturbations == 0) exactBuckets
      else {
        val flips = lit(0) +: (0 until probePerturbations).map(b => lit(1 << b))
        exactBuckets
          .withColumn("__flip", explode(array(flips: _*)))
          .withColumn("bucket", col("bucket").bitwiseXOR(col("__flip")).cast("int"))
          .drop("__flip")
      }
    // bounded driver-side set (|probes| x nTables x (perturbations+1));
    // IN-pruning the clustered buckets table reads only files whose
    // [min,max] tb range can hold a probed bucket — never the whole index.
    // A legacy pre-tb store has no composite key and falls back to the
    // full scan (still a broadcast join — no stored-side shuffle, just no
    // file pruning). Past `settings.annPruneMaxKeys` distinct keys the
    // same full-scan path takes over: a giant probe batch would otherwise
    // plant an isin with ~|probes| x nTables literals in the plan, and
    // Catalyst's per-file expression evaluation overhead overtakes the
    // pruning win long before the driver felt the collect — the limit
    // also caps that collect at maxKeys+1 rows.
    val maxKeys = settings.annPruneMaxKeys
    val probeKeys =
      if (!storeHasTb) Array.empty[Long]
      else probeBuckets.select(tbExpr.as("tb")).distinct()
        .limit(maxKeys + 1).collect().map(_.getLong(0))
    val stored =
      if (storeHasTb && probeKeys.length <= maxKeys)
        bucketsTable.readWhere(col("tb").isin(probeKeys.toSeq: _*))
      else bucketsTable.read()
    // probe joins are size-gated like every store probe: a bulk batch that
    // overflowed the IN-prune cap above would force-broadcast |probes| ×
    // nTables × (perturbations+1) rows — past the threshold AQE picks the
    // strategy instead of OOMing the driver
    val candidates0 = stored
      .join(Parallelism.maybeBroadcast(probeBuckets,
        settings.probeBroadcastThresholdBytes), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    // tombstoned ids drop out BEFORE ranking, so lower-ranked live
    // candidates fill in — the result a store physically without those
    // rows would return. Tombstone sets are bounded between purges, so
    // the anti-join broadcasts (gated like every probe).
    val candidates1 = excludeNeighbors match {
      case None => candidates0
      case Some(ex) =>
        // exclusion sets are batch-bounded: broadcast-gated like probes
        candidates0.join(
          Parallelism.maybeBroadcast(
            ex.select(col(ex.columns.head).as("neighbor_id")),
            settings.probeBroadcastThresholdBytes),
          Seq("neighbor_id"), "left_anti")
    }
    val candidates = withoutTombstoned(candidates1, "neighbor_id")
      .transform(Parallelism.materialize(_)) // feeds the id-set semi-join AND the rescore join
    val probeVecs = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      Similarity.quantizedDot(col(vecCol), col(vecCol)).as("probe_sq"))
    // candidate ids broadcast into the vectors scan: the stored vectors
    // stream through a semi-join (scan, zero shuffle) and only actual
    // candidates' embeddings survive into the rescore. Gated like every
    // store probe: an oversized candidate set (giant probe batch against
    // a dense index) degrades to a shuffle join instead of OOMing the
    // driver.
    val neighborVecs = vectorsTable.read()
      .select(col("vec_id").as("neighbor_id"), col("vec").as("neighbor_vec"),
        col("sq").as("neighbor_sq"))
      .join(Parallelism.maybeBroadcast(candidates.select("neighbor_id").distinct(),
          settings.probeBroadcastThresholdBytes),
        Seq("neighbor_id"), "left_semi")
    val withVecs = candidates
      .join(Parallelism.maybeBroadcast(probeVecs,
        settings.probeBroadcastThresholdBytes), Seq("probe_id"))
      .join(neighborVecs, Seq("neighbor_id"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    withVecs
      .withColumn("sim",
        Similarity.quantizedDot(col("probe_vec"), col("neighbor_vec")).cast("double") /
          sqrt(col("probe_sq").cast("double") * col("neighbor_sq").cast("double")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }
}
