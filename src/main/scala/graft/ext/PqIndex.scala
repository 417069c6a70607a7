package graft.ext

import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted product-quantization ANN index — the memory-compression scale
  * path beside [[AnnIndex]] (LSH) and [[IvfIndex]] (cells): vectors are
  * encoded ONCE into m small codes and every query scores probes against
  * CODES via asymmetric distance computation, so the stored scan carries
  * m BIGINTs per row instead of the embedding payload (~4× less I/O at
  * d=64/m=4, more at production dims — the FAISS `IndexPQ` workflow:
  * train sub-codebooks once, encode forever, ADC per query).
  *
  * Layout: two [[GraftTable]]s under `path` —
  *  - `centroids` (c, i, s, cx): the per-subspace sub-codebooks, written
  *    ONCE by [[train]] (m × codebookSize × dims/m rows — KB-sized) and
  *    broadcast into every encode and every query;
  *  - `codes` (vec_id, s, code): each ingested vector's m-subspace code
  *    rows, appended FLAT — no clustering, because codes are
  *    hash-uniform so file stats cannot prune them; the query-side win
  *    is scan-not-shuffle (probe subdistances broadcast into the stored
  *    scan), the [[NearDupIndex]] shape, not file skipping.
  *
  * [[add]] encodes only the new batch (codebook broadcast). [[query]]
  * computes the probe→centroid subdistance table (|probes| × m ×
  * codebookSize rows — tiny, broadcast), joins it into the single codes
  * scan, and sums per (probe, vec) — the stored table never shuffles and
  * never rejoins vectors. Results equal the one-shot
  * [[Similarity.pqTopK]] over the union of all adds when trained on the
  * same corpus (same codebook, same quantized subdistances) — the
  * property the catalog oracle checks.
  */
final class PqIndex(
    spark: SparkSession,
    path: String,
    m: Int = 4,
    codebookSize: Int = 16)(implicit settings: GraftSettings = GraftSettings.default)
  extends Tombstoned {
  require(m > 0 && codebookSize > 0, "m and codebookSize must be positive")

  private[ext] val centroidsTable = GraftTable(spark, s"$path/centroids")
  private[ext] val codesTable = GraftTable(spark, s"$path/codes")
  private[ext] val appliedTable = GraftTable(spark, s"$path/applied")
  private[ext] val removedTable = GraftTable(spark, s"$path/removed")
  protected def tombstoneIdCol: String = "vec_id"
  protected def tombstoneSettings: GraftSettings = settings

  // crash-injection point for the replay-contract specs (no-op unless armed)
  private[graft] val failpoints = new Failpoints

  def isTrained: Boolean = centroidsTable.exists

  def indexedCount: Long =
    if (!codesTable.exists) 0L
    else withoutTombstoned(codesTable.read().select("vec_id").distinct(), "vec_id")
      .count()

  private def tokenApplied(token: String): Boolean =
    appliedTable.exists &&
      appliedTable.read().filter(col("token") === token).limit(1).count() > 0

  private def centroids(): DataFrame =
    centroidsTable.read().select(col("c"), col("i"), col("s"), col("cx"))

  /** The trained dimensionality (max dim index + 1), VALIDATING this
    * instance's `m` against the persisted codebook (max subspace + 1) —
    * reopening a trained index with a different m would otherwise
    * silently mis-split every vector: the (i, s) codebook join drops the
    * mismatched subspaces and corrupts codes/distances with no error.
    * One metadata-plane row off the KB-sized codebook. */
  private def trainedDims(): Int = dimsCache.getOrElse {
    val r = centroids()
      .agg(max(col("i")).cast("int"), max(col("s")).cast("int")).head()
    val storedM = r.getInt(1) + 1
    require(storedM == m,
      s"PqIndex at $path was trained with m=$storedM, opened with m=$m")
    val d = r.getInt(0) + 1
    dimsCache = Some(d) // codebook immutable after train(): probe once per instance
    d
  }
  @volatile private var dimsCache: Option[Int] = None

  /** Ragged/mismatched vectors would silently drop dimensions from the
    * (i, s) codebook join and bias every code — fail loudly instead (the
    * [[Similarity.pqTopK]] contract). */
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
      s"PqIndex: ${d.getLong(2) - d.getLong(3)} NULL $what vectors")
    require(d.getInt(0) == d.getInt(1),
      s"PqIndex: ragged $what vectors (dims ${d.get(0)}..${d.get(1)})")
    expect.foreach(e => require(d.getInt(0) == e,
      s"PqIndex: $what dims ${d.getInt(0)} != trained dims $e"))
    true
  }

  /** Fit the per-subspace sub-codebooks (md5-ranked sample + `iters`
    * Lloyd rounds — see [[Similarity.pqTrainCentroids]]) and persist.
    * Train ONCE, before the first [[add]]: every later encode reuses this
    * codebook, which keeps incremental ingestion equal to the one-shot
    * operator (retraining the quantizer is an index rebuild, as in
    * production PQ). `iters = 0` keeps the md5 sample — the
    * engine-portable setting the catalog oracle mirrors. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      iters: Int = 0): Unit = {
    require(!isTrained, s"PqIndex at $path is already trained")
    require(checkDims(corpus, vecCol, "corpus", None),
      s"PqIndex: empty training corpus")
    val ex0 = Similarity.pqExplode(corpus, idCol, vecCol, m)
      .withColumn("micro", floor(col("x") * lit(1e6)).cast("long"))
    val ex = if (iters > 0) ex0.transform(Parallelism.materialize(_)) else ex0
    centroidsTable.append(
      Similarity.pqTrainCentroids(corpus, ex, idCol, vecCol, m, codebookSize, iters)
        .select(col("c"), col("i"), col("s"), col("cx")))
  }

  /** Encode and append a batch of (id, vector) rows. Ids must be globally
    * unique across adds. `ingestToken` makes at-least-once replays
    * IDEMPOTENT (the [[AnnIndex]]/[[IvfIndex]] contract): the token is
    * recorded BEFORE the append, and a replayed token appends only the
    * batch rows missing from the store. */
  def add(df: DataFrame, idCol: String, vecCol: String,
      ingestToken: Option[String] = None): Unit = {
    import spark.implicits._
    require(isTrained, s"PqIndex at $path is untrained — call train() first")
    val replay = ingestToken.exists(tokenApplied)
    // tombstoned ids never (re-)enter the index; empty batches (streaming
    // no-op delivery, or fully tombstoned) are a no-op — an unrecorded
    // token just re-noops on redelivery
    val in = withoutTombstoned(df, idCol)
    if (!checkDims(in, vecCol, "batch", Some(trainedDims()))) return
    val codes0 = Similarity.pqAssign(
        Similarity.pqExplode(in, idCol, vecCol, m), centroids())
      .select(col("id").as("vec_id"), col("s"), col("code"))
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
      codesTable.append(codes)
    // file-count maintenance across a long-running crawl
    codesTable.compactIfNeeded()
  }

  /** Approximate top-k against everything added so far via ADC. Returns
    * (probe_id, neighbor_id, rnk, dist) — quantized L2 distance,
    * ascending, ties to the smallest neighbor id; probes sharing an id
    * with an indexed vector exclude that self-match. */
  def query(probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(codesTable.exists, s"empty PQ index at $path")
    // empty probe frame: empty result, same schema
    if (!checkDims(probes, vecCol, "probe", Some(trainedDims())))
      return probes
        .select(col(idCol).as("probe_id"), col(idCol).as("neighbor_id"))
        .withColumn("rnk", lit(1)).withColumn("dist", lit(0L))
        .limit(0)
    // the probe-subdistance table is usually tiny (|probes| × m ×
    // codebookSize) and broadcasts — size-gated so a bulk probe batch
    // degrades to a shuffle join instead of OOMing the driver
    val probeSub = Parallelism.maybeBroadcast(
      Similarity.pqProbeSubDists(probes, idCol, vecCol, m, centroids()),
      settings.probeBroadcastThresholdBytes)
    // tombstoned ids drop out of the scan BEFORE scoring (the
    // AnnIndex.remove semantics); bounded between purges → broadcast
    val stored = withoutTombstoned(
        codesTable.read().select(col("vec_id"), col("s"), col("code")), "vec_id")
      .withColumnRenamed("vec_id", "id")
    Similarity.pqAdcTopK(stored, probeSub, k)
  }

  /** [[Tombstoned.purge]]'s store rewrite: flat — the codes store was
    * never clustered, so there is no layout to preserve. */
  protected def purgeRewrite(removedIds: DataFrame): Unit =
    if (codesTable.exists)
      codesTable.overwrite(Parallelism.materialize(
        codesTable.read().join(
          Parallelism.maybeBroadcast(removedIds, settings.probeBroadcastThresholdBytes),
          Seq("vec_id"), "left_anti")))
}
