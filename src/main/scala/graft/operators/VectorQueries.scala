package graft.operators

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import QueryDsl._

/** Similarity-search operators over the `embeddings` table (64-dim
  * `array<float>`). The oracled queries use the quantized fixed-point dot
  * product (see `Similarity.quantizedDot`) so results are bit-identical in
  * any engine; the xxhash-LSH scale path is rows-only + unit-tested.
  */
object VectorQueries {

  // DuckDB fragment: quantized dot of two list columns.
  private def qdotSql(a: String, b: String): String =
    s"CAST(list_sum([CAST(floor(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1e12) AS BIGINT) " +
      s"FOR i IN generate_series(1, len($a))]) AS BIGINT)"

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "e01_knn_brute",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            deterministic = true)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 5),
        d AS (SELECT probe_id, e.vec_id AS neighbor_id,
                ${qdotSql("pe", "e.embedding")} AS qd,
                ${qdotSql("pe", "pe")} AS qa,
                ${qdotSql("e.embedding", "e.embedding")} AS qb
              FROM p, embeddings e WHERE e.vec_id <> probe_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
              FROM d),
        k AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk""")),

    CatalogQuery(
      "e02_vector_norms",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            Similarity.quantizedDot(col("embedding"), col("embedding")).as("qnorm"))
          .orderBy(col("vec_id")),
      Some(s"""SELECT vec_id, label, ${qdotSql("embedding", "embedding")} AS qnorm
        FROM embeddings ORDER BY vec_id""")),

    // Scale path: hyperplane-LSH bucketed ANN (xxhash-seeded planes — no
    // cross-engine oracle; recall vs e01 asserted in unit tests).
    CatalogQuery(
      "e03_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.annTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nTables = 8, bitsPerTable = 6)
          .orderBy(col("probe_id"), col("rnk"))
      },
      None),

    CatalogQuery(
      "e04_cosine_neardup",
      (s, dir) =>
        Similarity.cosineNearDupPairs(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            threshold = 0.30, nTables = 8, bitsPerTable = 8)
          .orderBy(col("id_a"), col("id_b")),
      None)
  )
}
