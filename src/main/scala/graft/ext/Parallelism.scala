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
  * CLUSTER FAULT-TOLERANCE NOTE — `localCheckpoint(true)`. Operators in
  * this package materialize multi-consumer frames with eager
  * `localCheckpoint` (tokenize-once, band-rows-once, etc. — each site
  * comments why). Local checkpoints store blocks on EXECUTORS with no
  * lineage fallback: on a real cluster, losing an executor mid-job kills
  * the query instead of recomputing, unlike `cache()` (recompute) or
  * reliable `checkpoint()` (HDFS-backed, slower). That trade is right for
  * batch-with-retry pipelines (the driver rereuns the job; blocks are
  * ContextCleaner-freed with the frame), but jobs that must survive
  * executor loss WITHIN a run should swap these barriers for
  * `persist(MEMORY_AND_DISK)` + an action, or reliable checkpoints, at
  * ~2x the materialization cost. */
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
}
