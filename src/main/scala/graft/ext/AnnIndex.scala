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
  * bucket) from multi-table hyperplane LSH, and `vectors` (vec_id, vec,
  * sq) with the pre-quantized squared norm. `add` hashes only the new
  * batch and appends; `query` hashes only the probes, joins their bucket
  * rows against the stored buckets (ids-only through the shuffle),
  * dedups candidates, re-attaches vectors for exact scoring, and top-ks
  * per probe. Incremental growth and querying compose: a crawl pipeline
  * alternates add/query freely.
  */
final class AnnIndex(
    spark: SparkSession,
    path: String,
    nTables: Int = 8,
    bitsPerTable: Int = 6,
    portable: Boolean = false)(implicit settings: GraftSettings = GraftSettings.default) {

  private[ext] val bucketsTable = GraftTable(spark, s"$path/buckets")
  private[ext] val vectorsTable = GraftTable(spark, s"$path/vectors")

  def indexedCount: Long = if (vectorsTable.exists) vectorsTable.read().count() else 0L

  /** Hash and append a batch of (id, vector) rows. Ids must be globally
    * unique across adds. */
  def add(df: DataFrame, idCol: String, vecCol: String): Unit = {
    val buckets = Similarity.lshBucketRows(df, idCol, vecCol, nTables, bitsPerTable, portable)
      .select(col("id").as("vec_id"), col("tbl"), col("bucket"))
    val vectors = df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      Similarity.quantizedDot(col(vecCol), col(vecCol)).as("sq"))
    bucketsTable.append(buckets)
    vectorsTable.append(vectors)
  }

  /** Approximate top-k against everything added so far. Returns
    * (probe_id, neighbor_id, rnk, sim). Probes sharing an id with an
    * indexed vector exclude that self-match. */
  def query(probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(bucketsTable.exists, s"empty ANN index at $path")
    val probeBuckets = Similarity.lshBucketRows(
        probes, idCol, vecCol, nTables, bitsPerTable, portable)
      .select(col("id").as("probe_id"), col("tbl"), col("bucket"))
    val candidates = bucketsTable.read()
      .join(broadcast(probeBuckets), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val probeVecs = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      Similarity.quantizedDot(col(vecCol), col(vecCol)).as("probe_sq"))
    val withVecs = candidates
      .join(broadcast(probeVecs), Seq("probe_id"))
      .join(vectorsTable.read().select(col("vec_id").as("neighbor_id"),
        col("vec").as("neighbor_vec"), col("sq").as("neighbor_sq")), Seq("neighbor_id"))
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
