package graft.ext

import org.apache.spark.sql.DataFrame

/** Guards for explode-amplification stages.
  *
  * A stage's parallelism is fixed by its INPUT's partitioning, but an
  * explode-heavy pipeline (per-shingle hashing, per-dimension projections)
  * does work proportional to the POST-explode volume: a corpus that
  * arrives as one small parquet file (one row group = one unsplittable
  * partition) serializes the whole hot stage onto one core — measured 12x
  * on the signature aggregates. On a real cluster inputs arrive as many
  * files, so the repartition is a cheap no-op there (guarded below);
  * locally it spreads the narrow pre-explode rows across all cores.
  *
  * CLUSTER FAULT-TOLERANCE NOTE — barriers. Operators in this package
  * materialize multi-consumer frames through [[materialize]]
  * (tokenize-once, band-rows-once, etc. — each site comments why),
  * switched by `settings.barrierMode`. The default (`localCheckpoint`)
  * stores blocks on EXECUTORS with no lineage fallback: on a real
  * cluster, losing an executor mid-job kills the query instead of
  * recomputing, unlike `cache()` (recompute) or reliable `checkpoint()`
  * (HDFS-backed, slower). That trade is right for batch-with-retry
  * pipelines (the driver reruns the job; blocks are ContextCleaner-freed
  * with the frame); jobs that must survive executor loss WITHIN a run
  * set `barrierMode = persist` (MEMORY_AND_DISK + lineage, ~2x the
  * materialization cost) — a settings flip, no code edits. */
private[graft] object Parallelism {

  /** Repartition `df` to the session's default parallelism when its scan
    * would otherwise run on far fewer partitions.
    *
    * Width is estimated from `inputFiles` (the already-listed file index —
    * a logical-plan inspection), NOT from `df.rdd.getNumPartitions`: the
    * latter forces full physical planning of the subtree at operator-
    * construction time, per invocation. A file-backed frame with fewer
    * files than half the target cores is assumed partition-starved (the
    * single-row-group local parquet case); a derived frame (no input
    * files) has necessarily crossed a shuffle already and is at
    * `spark.sql.shuffle.partitions`, so it is left alone. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files * 2 < target) df.repartition(target) else df
  }

  /** Broadcast-hint `df` only when its optimizer size estimate fits
    * `thresholdBytes` — the probe side of an index join is usually a small
    * batch (broadcast = stored side never shuffles), but a bulk backfill
    * above the threshold degrades to a shuffle join (AQE picks) instead
    * of OOMing the driver. Same gate as GraftTable.updateKeysPlan. */
  def maybeBroadcast(df: DataFrame, thresholdBytes: Long): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(thresholdBytes)) org.apache.spark.sql.functions.broadcast(df) else df
  }

  /** Eagerly materialize a multi-consumer frame per
    * `settings.barrierMode` (see the class note above for the trade):
    * `localCheckpoint` — executor blocks, no lineage, fastest;
    * `persist` — MEMORY_AND_DISK with lineage, survives executor loss,
    * ~2x the materialization cost (the returned frame stays registered
    * with the CacheManager for the session's lifetime). */
  def materialize(df: DataFrame)(implicit settings: graft.conf.GraftSettings): DataFrame =
    settings.barrierMode match {
      case "localCheckpoint" => df.localCheckpoint(true)
      case "persist" =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count() // eager, like localCheckpoint(true): a barrier, not a hint
        p
      case other =>
        throw new IllegalArgumentException(
          s"unknown barrierMode '$other' (expected localCheckpoint | persist)")
    }

  /** [[materialize]] for ITERATIVE operators replacing a frame per round
    * (k-means centroids, CC labels, MMR selections, BPE vocab): the
    * superseded barrier is released eagerly. localCheckpoint blocks are
    * ContextCleaner-freed once unreferenced, but persist-mode entries
    * live in the CacheManager for the session — a 10k-iteration trainer
    * would otherwise pin thousands of dead cached frames and evict
    * useful blocks. `previous` must not be consumed again afterwards. */
  def rematerialize(next: DataFrame, previous: DataFrame)(
      implicit settings: graft.conf.GraftSettings): DataFrame = {
    val m = materialize(next)
    if (settings.barrierMode == "persist") previous.unpersist(blocking = false)
    m
  }
}
