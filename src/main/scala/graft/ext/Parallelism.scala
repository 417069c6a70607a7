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
  */
private[ext] object Parallelism {

  /** Repartition `df` to the session's default parallelism when its plan
    * would otherwise run on far fewer partitions. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions
    if (current * 2 < target) df.repartition(target) else df
  }
}
