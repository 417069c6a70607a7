package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted residual IVF-PQ index — the FAISS `IndexIVFPQ` (IVFADC)
  * serving shape, combining [[IvfIndex]]'s cell pruning with
  * [[PqIndex]]'s code compression: each vector is coarse-assigned to an
  * IVF cell, its RESIDUAL (vector − cell centroid) is PQ-encoded against
  * one shared sub-codebook, and a query ADC-scores probe residuals
  * against the codes of its probed cells only. This is the standard
  * billion-scale layout: the scan is BOTH cell-pruned (nProbe/nLists of
  * the files, via list_id clustering) AND compressed (m BIGINT codes per
  * row instead of the embedding payload).
  *
  * Layout: three [[GraftTable]]s under `path` —
  *  - `coarse` (list_id, cvec): the IVF codebook, written ONCE by
  *    [[train]] (nLists rows — KB-sized), broadcast everywhere;
  *  - `centroids` (c, i, s, cx): the residual PQ sub-codebooks, written
  *    ONCE by [[train]] — residuals center near zero regardless of cell,
  *    which is what lets ONE codebook cover every cell where raw-vector
  *    PQ would need per-cell books;
  *  - `codes` (vec_id, list_id, s, code): each vector's m code rows
  *    carrying its cell id, range-CLUSTERED on `list_id` so per-file
  *    min/max stats make a probe's cell set file-prunable (the layout
  *    [[PqIndex]] cannot have — raw PQ codes are hash-uniform, but the
  *    cell id is exactly the locality IVF adds).
  *
  * [[query]] equals the one-shot [[Similarity.ivfPqTopK]] over the union
  * of all adds when trained on the same corpus — the catalog oracle's
  * property (e25 shares e24's SQL chain).
  */
final class IvfPqIndex(
    spark: SparkSession,
    path: String,
    m: Int = 4,
    codebookSize: Int = 16)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {
  require(m > 0 && codebookSize > 0, "m and codebookSize must be positive")

  private[ext] val coarseTable = GraftTable(spark, s"$path/coarse")
  private[ext] val centroidsTable = GraftTable(spark, s"$path/centroids")
  private[ext] val codesTable = GraftTable(spark, s"$path/codes")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "vec_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  def isTrained: Boolean = coarseTable.exists && centroidsTable.exists

  def indexedCount: Long =
    if (!codesTable.exists) 0L
    else withoutTombstoned(codesTable.read().select("vec_id").distinct(), "vec_id")
      .count()

  private def tokenApplied(token: String): Boolean =
    appliedTable.exists &&
      appliedTable.read().filter(col("token") === token).limit(1).count() > 0

  private def coarse(): DataFrame =
    coarseTable.read().select(col("list_id"), col("cvec"))

  private def centroids(): DataFrame =
    centroidsTable.read().select(col("c"), col("i"), col("s"), col("cx"))

  /** The trained dimensionality off the KB-sized coarse codebook,
    * VALIDATING this instance's `m` against the persisted sub-codebooks
    * (max subspace + 1) — reopening with a different m would silently
    * mis-split every vector (the [[PqIndex]] guard). */
  private def trainedDims(): Int = dimsCache.getOrElse {
    val storedM = centroids().agg(max(col("s")).cast("int")).head().getInt(0) + 1
    require(storedM == m,
      s"IvfPqIndex at $path was trained with m=$storedM, opened with m=$m")
    val d = coarse().agg(max(size(col("cvec")))).head().getInt(0)
    dimsCache = Some(d) // codebooks immutable after train(): probe once per instance
    d
  }
  @volatile private var dimsCache: Option[Int] = None

  /** Validates dims, returning false when `df` is EMPTY — the aggregate
    * that sizes the vectors doubles as the emptiness probe. NULL vectors
    * in a non-empty frame fail loudly (they would otherwise masquerade as
    * an empty no-op batch); ragged or codebook-mismatched dims fail
    * loudly (they would silently corrupt assignments and codes). */
  private def checkDims(df: DataFrame, vecCol: String, what: String,
      expect: Option[Int]): Boolean = {
    val d = df.agg(min(size(col(vecCol))), max(size(col(vecCol))),
      count(lit(1)), count(col(vecCol))).head()
    if (d.getLong(2) == 0L) return false
    require(d.getLong(3) == d.getLong(2),
      s"IvfPqIndex: ${d.getLong(2) - d.getLong(3)} NULL $what vectors")
    require(d.getInt(0) == d.getInt(1),
      s"IvfPqIndex: ragged $what vectors (dims ${d.get(0)}..${d.get(1)})")
    expect.foreach(e => require(d.getInt(0) == e,
      s"IvfPqIndex: $what dims ${d.getInt(0)} != trained dims $e"))
    true
  }

  /** Fit BOTH quantizers — the coarse IVF codebook, then the residual PQ
    * sub-codebooks against that codebook's residuals (md5-ranked sample +
    * `iters` Lloyd rounds on residuals) — and persist. Train ONCE, before
    * the first [[add]]: retraining either quantizer is an index rebuild,
    * as in production IVFADC. `iters = 0` keeps the md5 sample — the
    * engine-portable setting the catalog oracle mirrors. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 0): Unit = {
    require(!isTrained, s"IvfPqIndex at $path is already trained")
    require(nLists > 0 && iters >= 0, "nLists must be positive, iters non-negative")
    require(checkDims(corpus, vecCol, "corpus", None),
      s"IvfPqIndex: empty training corpus")
    coarseTable.append(
      Similarity.ivfCentroids(corpus, idCol, vecCol, nLists)
        .select(col("list_id"), col("cvec")))
    // residuals against the PERSISTED codebook (read back, not the
    // in-flight frame) so training and every later add/query share
    // bit-identical centroid values
    val residuals = Parallelism.materialize(
      Similarity.ivfResiduals(corpus, idCol, vecCol, coarse()))
    val ex0 = Similarity.pqExplode(residuals, "id", "rvec", m)
      .withColumn("micro", floor(col("x") * lit(1e6)).cast("long"))
    val ex = if (iters > 0) ex0.transform(Parallelism.materialize(_)) else ex0
    centroidsTable.append(
      Similarity.pqTrainCentroids(residuals, ex, "id", "rvec", m, codebookSize, iters)
        .select(col("c"), col("i"), col("s"), col("cx")))
  }

  /** Coarse-assign, residual-encode, and append a batch of (id, vector)
    * rows, clustered on `list_id`. Ids must be globally unique across
    * adds. `ingestToken` makes at-least-once replays IDEMPOTENT (the
    * [[AnnIndex]]/[[IvfIndex]]/[[PqIndex]] contract): the token is
    * recorded BEFORE the append, and a replayed token appends only the
    * batch rows missing from the store. */
  def add(df: DataFrame, idCol: String, vecCol: String,
      ingestToken: Option[String] = None): Unit = {
    import spark.implicits._
    require(isTrained, s"IvfPqIndex at $path is untrained — call train() first")
    val replay = ingestToken.exists(tokenApplied)
    // tombstoned ids never (re-)enter the index; empty batches are a no-op
    val in = withoutTombstoned(df, idCol)
    if (!checkDims(in, vecCol, "batch", Some(trainedDims()))) return
    // materialized: the residual frame (one shuffle join) feeds BOTH the
    // pqExplode encode and the list_id re-join below — unmaterialized it
    // would run its assignment join twice per add (same policy as
    // ivfPqTopK; deterministic, so a cost issue, not correctness)
    val residuals = Parallelism.materialize(
      Similarity.ivfResiduals(in, idCol, vecCol, coarse()))
    // materialize before clustering: repartitionByRange SAMPLES its child
    // to pick range bounds, so an unmaterialized encode pipeline would run
    // twice (sample pass + write pass)
    val codes0 = Parallelism.materialize(
      Similarity.pqAssign(
          Similarity.pqExplode(residuals, "id", "rvec", m), centroids())
        .join(residuals.select(col("id"), col("list_id")), Seq("id"))
        .select(col("id").as("vec_id"), col("list_id"), col("s"), col("code")))
    ingestToken.filter(_ => !replay).foreach { t =>
      appliedTable.append(Seq(Tuple1(t)).toDF("token"))
    }
    failpoints.hit("after-token")
    val codes =
      if (!replay || !codesTable.exists) codes0
      else Parallelism.materialize( // rare path: fill the crash gap only
        codes0.join(codesTable.read().select(col("vec_id")).distinct(),
          Seq("vec_id"), "left_anti"))
    if (!replay || codes.limit(1).count() > 0)
      codesTable.appendClustered(codes, Seq("list_id"))
    // store maintenance: compaction stays CLUSTERED so the list_id ranges
    // remain tight and query-time cell pruning survives the rewrite
    codesTable.compactClusteredIfNeeded(Seq("list_id"))
  }

  /** Approximate top-k against everything added so far: probe residuals
    * ADC-scored against the probed cells' codes through a file-pruned
    * scan. Returns (probe_id, neighbor_id, rnk, dist) — quantized L2
    * residual distance, ascending, ties to the smallest neighbor id;
    * probes sharing an id with an indexed vector exclude that self-match. */
  def query(probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 3): DataFrame = {
    require(codesTable.exists, s"empty IVF-PQ index at $path")
    // empty probe frame: empty result, same schema
    if (!checkDims(probes, vecCol, "probe", Some(trainedDims())))
      return probes
        .select(col(idCol).as("probe_id"), col(idCol).as("neighbor_id"))
        .withColumn("rnk", lit(1)).withColumn("dist", lit(0L))
        .limit(0)
    val cb = coarse()
    // bounded driver-side cell set (≤ nLists values); the pruned read
    // scans only files whose [min,max] list range can hold a probed cell
    val lists = Similarity.ivfAssign(probes, idCol, vecCol, cb, topN = nProbe)
      .select("list_id").distinct().collect().map(_.getInt(0))
    val stored = withoutTombstoned(
        codesTable.readWhere(col("list_id").isin(lists.toSeq: _*)), "vec_id")
      .withColumnRenamed("vec_id", "id")
    // the ADC table is nProbe × m × codebookSize rows per probe — tiny,
    // size-gated so a bulk probe batch degrades to a shuffle join
    val probeSub = Parallelism.maybeBroadcast(
      Similarity.ivfPqProbeSub(probes, idCol, vecCol, m, cb, centroids(), nProbe),
      settings.probeBroadcastThresholdBytes)
    Similarity.ivfPqAdcTopK(stored, probeSub, k)
  }

  /** [[Tombstoned.purge]]'s store rewrite: re-clusters on `list_id` so
    * query-time cell pruning survives the purge. */
  protected def purgeRewrite(removedIds: DataFrame): Unit =
    if (codesTable.exists) {
      val kept = Parallelism.materialize(
        codesTable.read().join(
          Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes),
          Seq("vec_id"), "left_anti"))
      codesTable.overwrite(
        kept.repartitionByRange(math.max(1, codesTable.liveFiles().size),
          col("list_id")).sortWithinPartitions("list_id"))
    }
}
