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

  // Shared by e03 (one-shot annTopK) and e12 (persisted AnnIndex): the
  // index is REQUIRED to reproduce the one-shot result exactly.
  private lazy val annLshOracle: String =
    s"""${bucketsSql(nTables = 8, bitsPerTable = 6)},
        cand AS (SELECT DISTINCT c.vec_id AS neighbor_id, pr.vec_id AS probe_id
                 FROM buck c JOIN buck pr ON c.tbl = pr.tbl AND c.bucket = pr.bucket
                 WHERE pr.vec_id < 5 AND c.vec_id <> pr.vec_id),
        wv AS (SELECT cand.probe_id, cand.neighbor_id, p.embedding AS pe, n.embedding AS ne
               FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                         JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                  / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
              FROM wv),
        k AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // Shared by e17 (one-shot annTopKMultiprobe) and e18 (persisted AnnIndex
  // queried with probePerturbations = bitsPerTable): the index's multiprobe
  // path is REQUIRED to reproduce the one-shot expansion exactly.
  private lazy val annMultiprobeOracle: String =
    s"""${bucketsSql(nTables = 8, bitsPerTable = 6)},
        pb AS (SELECT vec_id, tbl, xor(bucket, f) AS bucket
               FROM buck, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS f)
               WHERE vec_id < 5),
        cand AS (SELECT DISTINCT c.vec_id AS neighbor_id, pr.vec_id AS probe_id
                 FROM buck c JOIN pb pr ON c.tbl = pr.tbl AND c.bucket = pr.bucket
                 WHERE c.vec_id <> pr.vec_id),
        wv AS (SELECT cand.probe_id, cand.neighbor_id, p.embedding AS pe, n.embedding AS ne
               FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                         JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                  / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
              FROM wv),
        k AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // Shared by e05 (one-shot ivfTopK) and e19 (persisted IvfIndex trained on
  // the same corpus): the incremental index must reproduce the one-shot
  // cell search exactly.
  private lazy val ivfOracle: String =
    s"""WITH cent AS (
          SELECT vec_id AS list_src, embedding AS cvec
          FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        centn AS (
          SELECT cvec, CAST(row_number() OVER (ORDER BY list_src) - 1 AS INTEGER) AS list_id
          FROM cent),
        scored AS (
          SELECT e.vec_id AS id, c.list_id,
            CAST(${qdotSql("e.embedding", "c.cvec")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("e.embedding", "e.embedding")} AS DOUBLE)
                     * CAST(${qdotSql("c.cvec", "c.cvec")} AS DOUBLE)) AS score
          FROM embeddings e, centn c),
        corpus_assign AS (
          SELECT id AS neighbor_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored) WHERE rn = 1),
        probe_assign AS (
          SELECT id AS probe_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored WHERE id < 5) WHERE rn <= 3),
        cand AS (
          SELECT DISTINCT probe_id, neighbor_id
          FROM corpus_assign JOIN probe_assign USING (list_id)
          WHERE neighbor_id <> probe_id),
        wv AS (SELECT cand.probe_id, cand.neighbor_id, p.embedding AS pe, n.embedding AS ne
               FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                         JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                  / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
              FROM wv),
        k AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // Shared by e10 (one-shot pqTopK) and e20 (persisted PqIndex trained on
  // the same corpus): the incremental index must reproduce the one-shot
  // encode + ADC exactly.
  private lazy val pqOracle: String =
    s"""$pqCtes
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, dist
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // The PQ encode + ADC chain up to the ranked candidates `k(probe_id,
  // neighbor_id, dist, rn)` — shared by e10/e20 (top-5 by ADC) and e22
  // (top-20 ADC shortlist re-ranked exactly).
  private lazy val pqCtes: String =
    """WITH cent0src AS (
          SELECT vec_id AS cid, embedding AS cv FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        cent AS (
          SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS c, cv
          FROM cent0src),
        cdim AS (
          SELECT c, ui - 1 AS i, ((ui - 1) * 4) // len(cv) AS s, CAST(cv[ui] AS DOUBLE) AS cx
          FROM (SELECT c, unnest(generate_series(1, len(cv))) AS ui, cv FROM cent)),
        edim AS (
          SELECT vec_id AS id, ui - 1 AS i, ((ui - 1) * 4) // len(embedding) AS s,
            CAST(embedding[ui] AS DOUBLE) AS x
          FROM (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS ui, embedding
                FROM embeddings)),
        dsub AS (
          SELECT id, s, c,
            CAST(sum(CAST(floor((x - cx) * (x - cx) * 1e12) AS BIGINT)) AS BIGINT) AS d
          FROM edim JOIN cdim USING (i, s) GROUP BY 1, 2, 3),
        codes AS (
          SELECT id, s, c AS code FROM (
            SELECT id, s, c, row_number() OVER (PARTITION BY id, s ORDER BY d, c) AS rn
            FROM dsub) WHERE rn = 1),
        adc AS (
          SELECT p.id AS probe_id, codes.id AS neighbor_id, CAST(sum(p.d) AS BIGINT) AS dist
          FROM codes JOIN dsub p ON p.s = codes.s AND p.c = codes.code
          WHERE p.id < 5 AND codes.id <> p.id
          GROUP BY 1, 2),
        k AS (
          SELECT probe_id, neighbor_id, dist,
            row_number() OVER (PARTITION BY probe_id ORDER BY dist, neighbor_id) AS rn
          FROM adc)"""

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

    // Scale path: hyperplane-LSH bucketed ANN, fully engine-portable —
    // md5-parity sign matrix + fixed-point (1e9) integer projections mean
    // bucket ids are exact integer math, and the candidate scoring uses the
    // quantized cosine; DuckDB mirrors every step.
    CatalogQuery(
      "e03_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.annTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nTables = 8, bitsPerTable = 6, portable = true)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(annLshOracle)),

    // The persisted-index path of the SAME computation: build an AnnIndex
    // incrementally (two adds), query it — results must equal one-shot
    // annTopK, so e03's oracle gates the index build/query machinery too
    // (GraftTable-backed buckets+vectors, candidate join, exact rescore).
    CatalogQuery(
      "e12_ann_index_query",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e12-").toString
        // stats stay ON: query() IN-prunes the clustered buckets table by
        // the probes' bucket keys, which needs per-file min/max stats
        val idx = new graft.ext.AnnIndex(s, s"file://$tmp",
          nTables = 8, bitsPerTable = 6, portable = true)
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(annLshOracle)),

    // The persisted index's RECALL KNOB: the same incrementally-built
    // AnnIndex queried with probePerturbations = bitsPerTable must equal
    // the one-shot multiprobe operator (e17) — so the oracle gates the
    // production path a crawl deploys: tune recall per query against a
    // stored index that never re-shuffles or grows.
    CatalogQuery(
      "e18_ann_index_multiprobe",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e18-").toString
        val idx = new graft.ext.AnnIndex(s, s"file://$tmp",
          nTables = 8, bitsPerTable = 6, portable = true)
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, probePerturbations = 6)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(annMultiprobeOracle)),

    // IVF inverted-index ANN — the second scale path beside LSH: nearest-
    // centroid cells from a deterministic md5-sampled codebook, probes
    // search their nProbe closest cells. Fully engine-portable (quantized
    // cosine everywhere), mirrored step-for-step in DuckDB.
    CatalogQuery(
      "e05_ivf_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nLists = 8, nProbe = 3)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(ivfOracle)),

    // The persisted-index path of the SAME cell search: train the coarse
    // quantizer once on the corpus, ingest in two incremental adds (cells
    // range-clustered on list_id), query nProbe cells through the pruned
    // store — results must equal one-shot ivfTopK, so e05's oracle gates
    // the stored codebook + clustered-cells machinery too.
    CatalogQuery(
      "e19_ivf_index_query",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e19-").toString
        val idx = new graft.ext.IvfIndex(s, s"file://$tmp")
        idx.train(emb, "vec_id", "embedding", nLists = 8)
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, nProbe = 3)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(ivfOracle)),

    // 8-bit scalar-quantized brute-force L2 — the memory-reduction scale
    // path: 1 byte/dim codes (4x smaller scans and shuffles), scoring in
    // exact integer arithmetic. The quantization grid is pure min/max +
    // IEEE double ops, so codes and distances are bit-identical in any
    // engine — the whole output is integers, no float hashing risk.
    CatalogQuery(
      "e06_sq_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.sqTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some("""WITH ev AS (
          SELECT vec_id, unnest(generate_series(1, len(embedding))) AS ui, embedding
          FROM embeddings),
        dx AS (SELECT vec_id, ui AS i, CAST(embedding[ui] AS DOUBLE) AS x FROM ev),
        stats AS (
          SELECT i, min(x) AS mn, (max(x) - min(x)) / 256.0 AS step FROM dx GROUP BY 1),
        codes AS (
          SELECT vec_id, i,
            CASE WHEN step <= 0 THEN 0
                 ELSE least(255, greatest(0, CAST(floor((x - mn) / step) AS INTEGER))) END AS c
          FROM dx JOIN stats USING (i)),
        pairs AS (
          SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
            CAST(sum((p.c - n.c) * (p.c - n.c)) AS BIGINT) AS qdist
          FROM codes p JOIN codes n ON p.i = n.i
          WHERE p.vec_id < 5 AND n.vec_id <> p.vec_id
          GROUP BY 1, 2),
        k AS (
          SELECT probe_id, neighbor_id, qdist,
            row_number() OVER (PARTITION BY probe_id ORDER BY qdist, neighbor_id) AS rn
          FROM pairs)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, qdist
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk""")),

    // Engine-portable k-means (TWO Lloyd updates, k=8): semantic
    // clustering for SemDeDup-style dedup and corpus stratification.
    // md5-ranked init, integer-quantized distances, exact-integer centroid
    // updates — the oracle unrolls both iterations in SQL and every cell
    // matches bit-for-bit (assignments AND quantized distances), proving
    // the portability COMPOUNDS: iteration 2's centroids are built from
    // iteration 1's cross-engine-identical assignments.
    CatalogQuery(
      "e07_kmeans",
      (s, dir) =>
        Similarity.kmeansAssignments(
            t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
          .select(col("id").as("vec_id"), col("cluster"), col("qdist"))
          .orderBy(col("vec_id")),
      Some("""WITH cent0src AS (
          SELECT vec_id AS cid, embedding AS cv FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        cent0 AS (
          SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cluster, cv
          FROM cent0src),
        c0 AS (
          SELECT cluster, ui AS i, CAST(cv[ui] AS DOUBLE) AS c
          FROM (SELECT cluster, unnest(generate_series(1, len(cv))) AS ui, cv FROM cent0)),
        ex0 AS (
          SELECT vec_id AS id, unnest(generate_series(1, len(embedding))) AS ui, embedding
          FROM embeddings),
        ex AS (
          SELECT id, ui AS i, CAST(embedding[ui] AS DOUBLE) AS x,
            CAST(floor(CAST(embedding[ui] AS DOUBLE) * 1000000.0) AS BIGINT) AS micro
          FROM ex0),
        d1 AS (
          SELECT id, cluster,
            CAST(sum(CAST(floor((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist
          FROM ex JOIN c0 USING (i) GROUP BY 1, 2),
        a1 AS (
          SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT cluster, i,
            CAST(floor(CAST(2 * s + n AS DOUBLE) / CAST(2 * n AS DOUBLE)) AS BIGINT) / 1000000.0 AS c
          FROM (SELECT cluster, i, CAST(sum(micro) AS BIGINT) AS s, count(*) AS n
                FROM a1 JOIN ex USING (id) GROUP BY 1, 2)),
        d2 AS (
          SELECT id, cluster,
            CAST(sum(CAST(floor((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist
          FROM ex JOIN c1 USING (i) GROUP BY 1, 2),
        a2 AS (
          SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d2) WHERE rn = 1),
        c2 AS (
          SELECT cluster, i,
            CAST(floor(CAST(2 * s + n AS DOUBLE) / CAST(2 * n AS DOUBLE)) AS BIGINT) / 1000000.0 AS c
          FROM (SELECT cluster, i, CAST(sum(micro) AS BIGINT) AS s, count(*) AS n
                FROM a2 JOIN ex USING (id) GROUP BY 1, 2)),
        d3 AS (
          SELECT id, cluster,
            CAST(sum(CAST(floor((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist
          FROM ex JOIN c2 USING (i) GROUP BY 1, 2)
        SELECT id AS vec_id, cluster, dist AS qdist FROM (
          SELECT id, cluster, dist,
            row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
          FROM d3) WHERE rn = 1 ORDER BY vec_id""")),

    CatalogQuery(
      "e04_cosine_neardup",
      (s, dir) =>
        Similarity.cosineNearDupPairs(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            threshold = 0.30, nTables = 8, bitsPerTable = 8, portable = true)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""${bucketsSql(nTables = 8, bitsPerTable = 8)},
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM buck a JOIN buck b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        wv AS (SELECT cand.id_a, cand.id_b, x.embedding AS va, y.embedding AS vb
               FROM cand JOIN embeddings x ON x.vec_id = cand.id_a
                         JOIN embeddings y ON y.vec_id = cand.id_b),
        r AS (SELECT id_a, id_b,
                CAST(${qdotSql("va", "vb")} AS DOUBLE)
                  / sqrt(CAST(${qdotSql("va", "va")} AS DOUBLE) * CAST(${qdotSql("vb", "vb")} AS DOUBLE)) AS cos
              FROM wv)
        SELECT id_a, id_b, cos FROM r WHERE cos >= 0.30 ORDER BY id_a, id_b""")),

    // SemDeDup (Abbas et al. 2023): k-means cluster, then cosine dedup
    // WITHIN clusters only — the embedding-space near-dup remover that
    // catches paraphrases sharing no n-grams, without an all-pairs join.
    // Oracle unrolls ONE Lloyd iteration (e07's two-iteration chain,
    // truncated) and mirrors the min-lower-id duplicate rule.
    CatalogQuery(
      "e08_semdedup",
      (s, dir) =>
        Similarity.semDedup(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            k = 8, iters = 1, threshold = 0.30)
          .select(col("id").as("vec_id"), col("cluster"), col("dup_of"), col("is_dup"))
          .orderBy(col("vec_id")),
      Some(s"""WITH cent0src AS (
          SELECT vec_id AS cid, embedding AS cv FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        cent0 AS (
          SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cluster, cv
          FROM cent0src),
        c0 AS (
          SELECT cluster, ui AS i, CAST(cv[ui] AS DOUBLE) AS c
          FROM (SELECT cluster, unnest(generate_series(1, len(cv))) AS ui, cv FROM cent0)),
        ex0 AS (
          SELECT vec_id AS id, unnest(generate_series(1, len(embedding))) AS ui, embedding
          FROM embeddings),
        ex AS (
          SELECT id, ui AS i, CAST(embedding[ui] AS DOUBLE) AS x,
            CAST(floor(CAST(embedding[ui] AS DOUBLE) * 1000000.0) AS BIGINT) AS micro
          FROM ex0),
        d1 AS (
          SELECT id, cluster,
            CAST(sum(CAST(floor((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist
          FROM ex JOIN c0 USING (i) GROUP BY 1, 2),
        a1 AS (
          SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d1) WHERE rn = 1),
        c1 AS (
          SELECT cluster, i,
            CAST(floor(CAST(2 * s + n AS DOUBLE) / CAST(2 * n AS DOUBLE)) AS BIGINT) / 1000000.0 AS c
          FROM (SELECT cluster, i, CAST(sum(micro) AS BIGINT) AS s, count(*) AS n
                FROM a1 JOIN ex USING (id) GROUP BY 1, 2)),
        d2 AS (
          SELECT id, cluster,
            CAST(sum(CAST(floor((x - c) * (x - c) * 1e12) AS BIGINT)) AS BIGINT) AS dist
          FROM ex JOIN c1 USING (i) GROUP BY 1, 2),
        asg AS (
          SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d2) WHERE rn = 1),
        m AS (SELECT asg.id, asg.cluster, e.embedding AS v
              FROM asg JOIN embeddings e ON e.vec_id = asg.id),
        pair AS (SELECT b.id AS idb, a.id AS ida,
                   CAST(${qdotSql("a.v", "b.v")} AS DOUBLE)
                     / sqrt(CAST(${qdotSql("a.v", "a.v")} AS DOUBLE)
                          * CAST(${qdotSql("b.v", "b.v")} AS DOUBLE)) AS sim
                 FROM m a JOIN m b ON a.cluster = b.cluster AND a.id < b.id),
        dup AS (SELECT idb AS id, min(ida) AS dup_of FROM pair WHERE sim >= 0.30 GROUP BY 1)
        SELECT m.id AS vec_id, m.cluster, dup.dup_of, dup.dup_of IS NOT NULL AS is_dup
        FROM m LEFT JOIN dup USING (id) ORDER BY vec_id""")),

    // kNN majority-vote auto-labeling: propagate curated labels onto a
    // held-out "unlabeled" slice (vec_id % 10 = 0) via the 5 nearest
    // labeled rows; ties break to the smallest label.
    CatalogQuery(
      "e09_knn_label",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnClassify(
            corpus = emb.filter(col("vec_id") % 10 =!= 0),
            probes = emb.filter(col("vec_id") % 10 === 0),
            idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 5)
          .select(col("probe_id").as("vec_id"), col("pred_label"), col("votes"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
                 FROM embeddings WHERE vec_id % 10 = 0),
        c AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 10 <> 0),
        d AS (SELECT probe_id, c.vec_id AS neighbor_id, c.label,
                ${qdotSql("pe", "c.embedding")} AS qd,
                ${qdotSql("pe", "pe")} AS qa,
                ${qdotSql("c.embedding", "c.embedding")} AS qb
              FROM p, c),
        r AS (SELECT probe_id, neighbor_id, label,
                CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
              FROM d),
        k AS (SELECT probe_id, label FROM (
                SELECT probe_id, label,
                  row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
                FROM r) WHERE rn <= 5),
        v AS (SELECT probe_id, label, count(*) AS votes FROM k GROUP BY 1, 2),
        b AS (SELECT probe_id, label, votes,
                row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, label) AS rn
              FROM v)
        SELECT probe_id AS vec_id, label AS pred_label, votes
        FROM b WHERE rn = 1 ORDER BY vec_id""")),

    // Product-quantization ANN (Jégou et al. 2011): m=4 subspaces, 16-entry
    // sub-codebooks (md5-sampled, iters=0 so the oracle needs no Lloyd
    // unrolling), asymmetric-distance scoring against CODES — corpus
    // vectors never rejoin after encoding. The oracle reproduces encode
    // and ADC generically via a subspace-keyed join, no per-subspace SQL.
    CatalogQuery(
      "e10_pq_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(
            corpus = emb, probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            m = 4, codebookSize = 16)
          .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("dist"))
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(pqOracle)),

    // The persisted-index path of the SAME ADC search: train the
    // sub-codebooks once on the corpus, encode in two incremental adds,
    // query through the stored codes — results must equal one-shot
    // pqTopK, so e10's oracle gates the stored codebook + codes
    // machinery too (the FAISS IndexPQ workflow: codes are ~4× smaller
    // than vectors, so the per-query scan I/O shrinks by the same factor).
    CatalogQuery(
      "e20_pq_index_query",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e20-").toString
        val idx = new graft.ext.PqIndex(s, s"file://$tmp", m = 4, codebookSize = 16)
        idx.train(emb, "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(pqOracle)),

    // Contrastive hard-negative mining: most-similar rows with a DIFFERENT
    // label — the confusable negatives that actually train an embedding
    // model. e01's scoring with a label-inequality pair filter.
    CatalogQuery(
      "e11_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(
            corpus = emb, probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS plabel
                 FROM embeddings WHERE vec_id < 5),
        d AS (SELECT probe_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
                ${qdotSql("pe", "e.embedding")} AS qd,
                ${qdotSql("pe", "pe")} AS qa,
                ${qdotSql("e.embedding", "e.embedding")} AS qb
              FROM p, embeddings e
              WHERE e.vec_id <> probe_id AND e.label <> plabel),
        r AS (SELECT probe_id, neighbor_id, neighbor_label,
                CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
              FROM d),
        k AS (SELECT probe_id, neighbor_id, neighbor_label, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, neighbor_label, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk""")),

    // Johnson–Lindenstrauss random projection 64 -> 16 dims: md5-derived
    // ±1 sign matrix (built once driver-side, shipped as literals),
    // integer-micro exact dots. The dimensionality-reduction front end for
    // ANN/clustering at scale: 4x fewer vector bytes through every
    // downstream shuffle.
    CatalogQuery(
      "e13_random_projection",
      (s, dir) =>
        Similarity.randomProjection(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            inDims = 64, outDims = 16)
          .orderBy(col("vec_id")),
      Some {
        val pivot = (0 until 16)
          .map(j => s"CAST(max(CASE WHEN j = $j THEN pj END) AS BIGINT) AS p$j")
          .mkString(", ")
        s"""WITH s AS (
          SELECT j, i,
            CASE WHEN substr(md5('rp:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)
                   IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END AS sgn
          FROM (SELECT unnest(generate_series(0, 15)) AS j),
               (SELECT unnest(generate_series(0, 63)) AS i)),
        m AS (
          SELECT vec_id, i, CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT) AS micro
          FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i)),
        p AS (
          SELECT vec_id, j, sum(sgn * micro) AS pj
          FROM m JOIN s USING (i) GROUP BY 1, 2)
        SELECT vec_id, $pivot
        FROM p GROUP BY vec_id ORDER BY vec_id"""
      }),

    // Embedding-space outlier filter (training-data curation): exact
    // integer L2 distance to the own-label centroid; farthest 5% per label
    // flagged via a histogram order statistic — no global sort, no per-row
    // rank window.
    CatalogQuery(
      "e14_centroid_outliers",
      (s, dir) =>
        Similarity.centroidOutliers(
            t(s, dir, "embeddings"), "vec_id", "embedding", "label",
            tailPpm = 50000L)
          .orderBy(col("vec_id")),
      Some("""WITH m AS (
          SELECT vec_id, label, i,
            CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT) AS x
          FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i)),
        cent AS (
          SELECT label, i,
            (CAST(sum(x + 16777216) AS BIGINT) * 2 + count(*)) // (count(*) * 2) - 16777216 AS c
          FROM m GROUP BY 1, 2),
        d AS (
          SELECT m.vec_id, m.label,
            CAST(sum((m.x - cent.c) * (m.x - cent.c)) AS BIGINT) AS d2
          FROM m JOIN cent USING (label, i) GROUP BY 1, 2),
        hist AS (SELECT label, d2, count(*) AS c FROM d GROUP BY 1, 2),
        cum AS (SELECT label, d2, c,
                  sum(c) OVER (PARTITION BY label ORDER BY d2
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
                  sum(c) OVER (PARTITION BY label) AS n
                FROM hist),
        th AS (SELECT label,
                 min(CASE WHEN cumc >= (n * 950000) // 1000000 THEN d2 END) AS t
               FROM cum GROUP BY label)
        SELECT d.vec_id, d.label, d.d2, (d.d2 > th.t) AS is_outlier
        FROM d JOIN th USING (label) ORDER BY vec_id""")),

    // MMR diversified re-ranking (Carbonell & Goldstein 1998): greedy
    // k=3 selection from a 10-candidate pool per probe, score =
    // 0.7·sim(q,d) − 0.3·max sim(d, selected). The oracle unrolls the
    // three selection steps as CTEs (the e07/e08 unrolled-iteration
    // trick); every argmax ties on the candidate id.
    CatalogQuery(
      "e15_mmr_rerank",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.mmrRerank(
            corpus = emb, probes = emb.filter(col("vec_id") < 3),
            idCol = "vec_id", vecCol = "embedding",
            k = 3, poolSize = 10, lambdaPpm = 700000L)
          .orderBy(col("probe_id"), col("step"))
      },
      Some(s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 3),
        d AS (SELECT probe_id, e.vec_id AS neighbor_id,
                ${qdotSql("pe", "e.embedding")} AS qd,
                ${qdotSql("pe", "pe")} AS qa,
                ${qdotSql("e.embedding", "e.embedding")} AS qb
              FROM p, embeddings e WHERE e.vec_id <> probe_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
              FROM d),
        kk AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r),
        pool AS (SELECT probe_id, neighbor_id, sim FROM kk WHERE rn <= 10),
        pv AS (SELECT pool.probe_id, pool.neighbor_id, e.embedding AS v
               FROM pool JOIN embeddings e ON e.vec_id = pool.neighbor_id),
        ps AS (SELECT a.probe_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
                 CAST(${qdotSql("a.v", "b.v")} AS DOUBLE)
                   / sqrt(CAST(${qdotSql("a.v", "a.v")} AS DOUBLE) * CAST(${qdotSql("b.v", "b.v")} AS DOUBLE)) AS psim
               FROM pv a JOIN pv b
                 ON a.probe_id = b.probe_id AND a.neighbor_id <> b.neighbor_id),
        s1 AS (SELECT probe_id, neighbor_id, 1 AS step, sim AS score
               FROM kk WHERE rn = 1),
        c2 AS (SELECT pool.probe_id, pool.neighbor_id, pool.sim, max(ps.psim) AS mx
               FROM pool
               JOIN s1 ON s1.probe_id = pool.probe_id AND pool.neighbor_id <> s1.neighbor_id
               JOIN ps ON ps.probe_id = pool.probe_id AND ps.ida = pool.neighbor_id
                      AND ps.idb = s1.neighbor_id
               GROUP BY 1, 2, 3),
        s2 AS (SELECT probe_id, neighbor_id, 2 AS step, score FROM (
                 SELECT probe_id, neighbor_id,
                   (700000 / 1000000.0) * sim - (300000 / 1000000.0) * mx AS score,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY ((700000 / 1000000.0) * sim - (300000 / 1000000.0) * mx) DESC,
                       neighbor_id) AS rn2
                 FROM c2) x WHERE rn2 = 1),
        sel12 AS (SELECT probe_id, neighbor_id FROM s1
                  UNION ALL SELECT probe_id, neighbor_id FROM s2),
        c3 AS (SELECT pool.probe_id, pool.neighbor_id, pool.sim, max(ps.psim) AS mx
               FROM pool
               LEFT JOIN sel12 x ON x.probe_id = pool.probe_id
                                AND x.neighbor_id = pool.neighbor_id
               JOIN ps ON ps.probe_id = pool.probe_id AND ps.ida = pool.neighbor_id
               JOIN sel12 s ON s.probe_id = ps.probe_id AND s.neighbor_id = ps.idb
               WHERE x.neighbor_id IS NULL
               GROUP BY 1, 2, 3),
        s3 AS (SELECT probe_id, neighbor_id, 3 AS step, score FROM (
                 SELECT probe_id, neighbor_id,
                   (700000 / 1000000.0) * sim - (300000 / 1000000.0) * mx AS score,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY ((700000 / 1000000.0) * sim - (300000 / 1000000.0) * mx) DESC,
                       neighbor_id) AS rn3
                 FROM c3) x WHERE rn3 = 1)
        SELECT probe_id, neighbor_id, step, score FROM s1
        UNION ALL SELECT probe_id, neighbor_id, step, score FROM s2
        UNION ALL SELECT probe_id, neighbor_id, step, score FROM s3
        ORDER BY probe_id, step""")),

    // ANN recall@k evaluation: LSH ANN results scored against the exact
    // brute-force ground truth — the eval every production index runs.
    // Per-probe hits + exact-integer recall; corpus-size-independent
    // (two probes*k frames, one semi join, one aggregate).
    CatalogQuery(
      "e16_ann_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        // truth feeds TWO consumers inside recallAtK (the hits semi-join
        // and the per-probe n_truth count) — materialize so the brute-force
        // corpus pass runs ONCE, the e21 discipline (the un-barriered form
        // inlined the whole BNLJ subtree twice in the physical plan)
        val truth = graft.ext.Parallelism.checkpointTracked(
          Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding",
            k = 5, deterministic = true))
        Similarity.recallAtK(
            ann = Similarity.annTopK(emb, probes, "vec_id", "embedding",
              k = 5, nTables = 8, bitsPerTable = 6, portable = true),
            truth = truth,
            k = 5)
          .orderBy(col("probe_id"))
      },
      Some(s"""${bucketsSql(nTables = 8, bitsPerTable = 6)},
        cand AS (SELECT DISTINCT c.vec_id AS neighbor_id, pr.vec_id AS probe_id
                 FROM buck c JOIN buck pr ON c.tbl = pr.tbl AND c.bucket = pr.bucket
                 WHERE pr.vec_id < 5 AND c.vec_id <> pr.vec_id),
        wv AS (SELECT cand.probe_id, cand.neighbor_id, p.embedding AS pe, n.embedding AS ne
               FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                         JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        ar AS (SELECT probe_id, neighbor_id,
                 CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                   / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
               FROM wv),
        ak AS (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
               FROM ar),
        ann AS (SELECT probe_id, neighbor_id FROM ak WHERE rn <= 5),
        p2 AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 5),
        d2 AS (SELECT probe_id, e.vec_id AS neighbor_id,
                 ${qdotSql("pe", "e.embedding")} AS qd,
                 ${qdotSql("pe", "pe")} AS qa,
                 ${qdotSql("e.embedding", "e.embedding")} AS qb
               FROM p2, embeddings e WHERE e.vec_id <> probe_id),
        r2 AS (SELECT probe_id, neighbor_id,
                 CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
               FROM d2),
        k2 AS (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
               FROM r2),
        truth AS (SELECT probe_id, neighbor_id FROM k2 WHERE rn <= 5),
        hits AS (SELECT t.probe_id, count(*) AS hits
                 FROM truth t JOIN ann a USING (probe_id, neighbor_id) GROUP BY 1),
        nt AS (SELECT probe_id, count(*) AS n_truth FROM truth GROUP BY 1)
        SELECT nt.probe_id, nt.n_truth,
          coalesce(hits.hits, CAST(0 AS BIGINT)) AS hits,
          ${graft.operators.QueryDsl.ratio6Sql("coalesce(hits.hits, 0)", "nt.n_truth")} AS recall
        FROM nt LEFT JOIN hits USING (probe_id)
        ORDER BY nt.probe_id""")),

    // Multi-probe LSH (Lv et al. 2007): each probe also searches every
    // 1-bit perturbation of its bucket per table — the recall knob that
    // costs only query-side candidates, never index size. Candidates are
    // a superset of e03's, so recall@k is non-decreasing at identical
    // stored-index cost.
    CatalogQuery(
      "e17_ann_multiprobe",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.annTopKMultiprobe(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nTables = 8, bitsPerTable = 6, portable = true)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(annMultiprobeOracle)),

    // IVF probe-budget sweep — the vector-side operating-point report
    // (d45's sibling): recall@5 vs exact truth at nProbe in {1,2,4},
    // the curve an ANN deployment reads to pick its latency/recall
    // trade. Monotone non-decreasing in nProbe by construction (probe
    // sets nest). The truth frame is materialized once and shared by
    // all three budgets; each budget's candidate generation is the
    // audited e05 cell-join shape.
    CatalogQuery(
      "e21_ivf_probe_sweep",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        val truth = graft.ext.Parallelism.materialize(
          Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding",
            k = 5, deterministic = true))(graft.conf.GraftSettings.default)
        Seq(1, 2, 4).map { np =>
          Similarity.recallAtK(
              Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
                k = 5, nLists = 8, nProbe = np),
              truth, k = 5)
            .withColumn("probe_budget", lit(np))
        }.reduce(_.unionByName(_))
          .select(col("probe_budget"), col("probe_id"), col("n_truth"),
            col("hits"), col("recall"))
          .orderBy(col("probe_budget"), col("probe_id"))
      },
      Some(ivfSweepOracle)),

    // Two-stage retrieval: PQ/ADC shortlist (k'=20 — the compressed-
    // domain coarse pass) re-ranked by EXACT quantized cosine on the
    // shortlist only — the standard serving path that buys back ADC's
    // approximation error for O(probes x k') exact work, never a corpus
    // rescan. Final order is true-similarity order; the oracle composes
    // the shared PQ chain with the exact rescore.
    CatalogQuery(
      "e22_pq_rerank",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        val shortlist = Similarity.pqTopK(emb, probes, "vec_id", "embedding",
          k = 20, m = 4, codebookSize = 16)
        Similarity.exactRerank(shortlist, emb, probes, "vec_id", "embedding", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(s"""$pqCtes,
        cand AS (SELECT probe_id, neighbor_id FROM k WHERE rn <= 20),
        wv AS (SELECT cand.probe_id, cand.neighbor_id,
            p.embedding AS pe, n.embedding AS ne
          FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                    JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        rx AS (SELECT probe_id, neighbor_id,
            CAST(${qdotSql("pe", "ne")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
          FROM wv),
        kx AS (SELECT probe_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
          FROM rx)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM kx WHERE rn <= 5 ORDER BY probe_id, rnk""")),

    // Hybrid (filtered) vector search, PRE-filter shape: the metadata
    // predicate (label IN (1,3,5)) restricts the corpus side BEFORE cell
    // candidate generation and ranking, so every probe's top-k is over
    // predicate survivors — post-filtering a k-list would return short
    // (or empty) lists under a selective predicate. Codebook trained on
    // the FULL corpus (an index is built before query predicates exist;
    // cell geometry must not shift per query). At scale the predicate is
    // a plain pushed-down column filter over the cell-pruned scan.
    CatalogQuery(
      "e23_filtered_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nLists = 8, nProbe = 3,
            corpusFilter = Some(col("label").isin(1, 3, 5)))
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(filteredIvfOracle)),

    // The persisted-index path of the SAME hybrid search: label persisted
    // as an attribute column beside each vector at add time, the query
    // predicate applied to the cell-pruned scan (PushedFilters + row-group
    // stats) before ranking — must equal the one-shot filtered ivfTopK,
    // so e23's oracle gates the attr-column machinery too.
    CatalogQuery(
      "e26_filtered_ivf_index",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e26-").toString
        val idx = new graft.ext.IvfIndex(s, s"file://$tmp")
        idx.train(emb, "vec_id", "embedding", nLists = 8)
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          attrCols = Seq("label"))
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          attrCols = Seq("label"))
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, nProbe = 3,
            corpusFilter = Some(col("label").isin(1, 3, 5)))
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(filteredIvfOracle)),

    // Residual IVF-PQ + ADC (the FAISS IVFADC shape): coarse-assign each
    // vector to its IVF cell, PQ-encode the residual (vector − centroid,
    // DOUBLE arithmetic — float subtraction would round differently per
    // engine), then ADC-score probe residuals against the probed cells'
    // codes only. One shared residual codebook covers every cell; the
    // oracle rebuilds the whole chain — coarse assign → residuals →
    // md5-sampled codebook → encode → per-(probe,cell) ADC — in SQL.
    CatalogQuery(
      "e24_ivfpq_adc",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(
            corpus = emb,
            probes = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            nLists = 8, nProbe = 3, m = 4, codebookSize = 16)
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some(ivfPqOracle)),

    // The persisted-index path of the SAME residual-ADC search: train
    // both quantizers once, ingest in two incremental adds (codes
    // range-clustered on list_id), query nProbe cells through the pruned
    // store — results must equal one-shot ivfPqTopK, so e24's oracle
    // gates the stored codebooks + clustered-codes machinery too.
    CatalogQuery(
      "e25_ivfpq_index_query",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e25-").toString
        val idx = new graft.ext.IvfPqIndex(s, s"file://$tmp", m = 4, codebookSize = 16)
        idx.train(emb, "vec_id", "embedding", nLists = 8)
        idx.add(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
        idx.add(emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
        val out = idx.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 5, nProbe = 3)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(ivfPqOracle)),

    // The full production serving path, composed end to end: a persisted
    // IVF-PQ index answers a k'=20 ADC shortlist through its cell-pruned
    // compressed scan, then exactRerank buys back the approximation error
    // with O(probes x k') exact quantized-cosine work — never a corpus
    // rescan. The oracle composes the shared IVFADC chain with the exact
    // rescore chain.
    CatalogQuery(
      "e27_ivfpq_rerank",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        val tmp = java.nio.file.Files.createTempDirectory("graft-e27-").toString
        val idx = new graft.ext.IvfPqIndex(s, s"file://$tmp", m = 4, codebookSize = 16)
        idx.train(emb, "vec_id", "embedding", nLists = 8)
        idx.add(emb, "vec_id", "embedding")
        val shortlist = idx.query(probes, "vec_id", "embedding", k = 20, nProbe = 3)
        val out = Similarity.exactRerank(shortlist, emb, probes,
            "vec_id", "embedding", k = 5)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch index
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(s"""$ivfPqCtes,
        cand2 AS (SELECT probe_id, neighbor_id FROM kf WHERE rn <= 20),
        wv2 AS (SELECT cand2.probe_id, cand2.neighbor_id,
            p.embedding AS pe, n.embedding AS ne
          FROM cand2 JOIN embeddings p ON p.vec_id = cand2.probe_id
                     JOIN embeddings n ON n.vec_id = cand2.neighbor_id),
        rx AS (SELECT probe_id, neighbor_id,
            CAST(${qdotSql("pe", "ne")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
          FROM wv2),
        kx AS (SELECT probe_id, neighbor_id, sim,
            row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
          FROM rx)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM kx WHERE rn <= 5 ORDER BY probe_id, rnk""")),

    // TRUE hybrid search — the serving capstone: a persisted BM25 lexical
    // shortlist (LexIndex over documents, d51 machinery) fused with a
    // persisted ANN shortlist (AnnIndex over embeddings, e12 machinery)
    // by reciprocal-rank fusion. Rank-only fusion needs no calibration
    // between pico-BM25 and cosine — and is exactly reproducible, so the
    // oracle recomputes BOTH retrievers corpus-level and the same RRF
    // merge. (e26 is FILTERED vector search; this is lexical⊕vector.)
    CatalogQuery(
      "e28_hybrid_rrf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files.createTempDirectory("graft-e28-").toString
        val ann = new graft.ext.AnnIndex(s, s"file://$tmp/ann",
          nTables = 8, bitsPerTable = 6, portable = true)
        ann.add(emb, "vec_id", "embedding")
        val lex = new graft.ext.LexIndex(s, s"file://$tmp/lex")
        lex.add(docs, "doc_id", "text")
        val vecTop = ann.query(emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        val lexTop = lex.search(docs.filter(col("doc_id") < 5), "doc_id", "text",
            k = 10, excludeSelf = true)
          .select(col("query_id").as("probe_id"), col("doc_id").as("neighbor_id"), col("rnk"))
        val out = Similarity.rrfFuse(Seq(vecTop, lexTop), k = 10)
          .orderBy(col("probe_id"), col("rnk"))
          .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch indexes
        graft.lake.FsUtils.deletePath(s, s"file://$tmp")
        out
      },
      Some(s"""${bucketsSql(nTables = 8, bitsPerTable = 6)},
        vcand AS (SELECT DISTINCT c.vec_id AS neighbor_id, pr.vec_id AS probe_id
                  FROM buck c JOIN buck pr ON c.tbl = pr.tbl AND c.bucket = pr.bucket
                  WHERE pr.vec_id < 5 AND c.vec_id <> pr.vec_id),
        vwv AS (SELECT vcand.probe_id, vcand.neighbor_id, p.embedding AS pe, n.embedding AS ne
                FROM vcand JOIN embeddings p ON p.vec_id = vcand.probe_id
                           JOIN embeddings n ON n.vec_id = vcand.neighbor_id),
        vr AS (SELECT probe_id, neighbor_id,
                 CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                   / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
               FROM vwv),
        vtop AS (SELECT probe_id, neighbor_id, rn FROM (
                   SELECT probe_id, neighbor_id,
                     row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
                   FROM vr) WHERE rn <= 10),
        ${QueryDsl.bm25CtesSql(maxQueryId = 5)},
        ltop AS (SELECT query_id AS probe_id, doc_id AS neighbor_id, rn
                 FROM bm WHERE rn <= 10),
        u AS (SELECT probe_id, neighbor_id,
                CAST(CAST(1.0 / (60 + rn) AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS rrf
              FROM vtop
              UNION ALL
              SELECT probe_id, neighbor_id,
                CAST(CAST(1.0 / (60 + rn) AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS rrf
              FROM ltop),
        fa AS (SELECT probe_id, neighbor_id, CAST(sum(rrf) AS BIGINT) AS rrf_micro
               FROM u GROUP BY 1, 2),
        fr AS (SELECT probe_id, neighbor_id, rrf_micro,
                 row_number() OVER (PARTITION BY probe_id ORDER BY rrf_micro DESC, neighbor_id) AS rn
               FROM fa)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, rrf_micro
        FROM fr WHERE rn <= 10 ORDER BY probe_id, rnk"""))
  )

  // Shared by e23 (one-shot filtered ivfTopK) and e26 (persisted IvfIndex
  // with a label attribute column): the index's pre-filter path must
  // reproduce the one-shot hybrid search exactly.
  private lazy val filteredIvfOracle: String = s"""WITH cent AS (
          SELECT vec_id AS list_src, embedding AS cvec
          FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        centn AS (
          SELECT cvec, CAST(row_number() OVER (ORDER BY list_src) - 1 AS INTEGER) AS list_id
          FROM cent),
        scored AS (
          SELECT e.vec_id AS id, e.label, c.list_id,
            CAST(${qdotSql("e.embedding", "c.cvec")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("e.embedding", "e.embedding")} AS DOUBLE)
                     * CAST(${qdotSql("c.cvec", "c.cvec")} AS DOUBLE)) AS score
          FROM embeddings e, centn c),
        corpus_assign AS (
          SELECT id AS neighbor_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored WHERE label IN (1, 3, 5)) WHERE rn = 1),
        probe_assign AS (
          SELECT id AS probe_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored WHERE id < 5) WHERE rn <= 3),
        cand AS (
          SELECT DISTINCT probe_id, neighbor_id
          FROM corpus_assign JOIN probe_assign USING (list_id)
          WHERE neighbor_id <> probe_id),
        wv AS (SELECT cand.probe_id, cand.neighbor_id, p.embedding AS pe, n.embedding AS ne
               FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
                         JOIN embeddings n ON n.vec_id = cand.neighbor_id),
        r AS (SELECT probe_id, neighbor_id,
                CAST(${qdotSql("pe", "ne")} AS DOUBLE)
                  / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
              FROM wv),
        k AS (SELECT probe_id, neighbor_id, sim,
                row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM r)
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, sim
        FROM k WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // Shared by e24 (one-shot ivfPqTopK) and e25 (persisted IvfPqIndex
  // trained on the same corpus): the incremental index must reproduce the
  // one-shot residual-encode + ADC chain exactly.
  private lazy val ivfPqOracle: String = s"""$ivfPqCtes
        SELECT probe_id, neighbor_id, CAST(rn AS INTEGER) AS rnk, dist
        FROM kf WHERE rn <= 5 ORDER BY probe_id, rnk"""

  // The residual-encode + per-(probe,cell) ADC chain up to the ranked
  // candidates `kf(probe_id, neighbor_id, dist, rn)` — shared by e24/e25
  // (top-5 by ADC) and e27 (top-20 ADC shortlist re-ranked exactly).
  private lazy val ivfPqCtes: String = s"""WITH cent AS (
          SELECT vec_id AS list_src, embedding AS cvec
          FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        centn AS (
          SELECT cvec, CAST(row_number() OVER (ORDER BY list_src) - 1 AS INTEGER) AS list_id
          FROM cent),
        scored AS (
          SELECT e.vec_id AS id, c.list_id,
            CAST(${qdotSql("e.embedding", "c.cvec")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("e.embedding", "e.embedding")} AS DOUBLE)
                     * CAST(${qdotSql("c.cvec", "c.cvec")} AS DOUBLE)) AS score
          FROM embeddings e, centn c),
        corpus_assign AS (
          SELECT id AS neighbor_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored) WHERE rn = 1),
        probe_assign AS (
          SELECT id AS probe_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored WHERE id < 5) WHERE rn <= 3),
        gdim AS (
          SELECT list_id, ui - 1 AS i, CAST(cvec[ui] AS DOUBLE) AS gx
          FROM (SELECT list_id, unnest(generate_series(1, len(cvec))) AS ui, cvec FROM centn)),
        edim AS (
          SELECT t.vec_id AS id, ca.list_id, t.ui - 1 AS i,
            ((t.ui - 1) * 4) // len(t.embedding) AS s,
            CAST(t.embedding[t.ui] AS DOUBLE) AS x0
          FROM (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS ui, embedding
                FROM embeddings) t
          JOIN corpus_assign ca ON ca.neighbor_id = t.vec_id),
        rdim AS (SELECT id, list_id, i, s, x0 - gx AS x FROM edim JOIN gdim USING (list_id, i)),
        pqsrc AS (SELECT vec_id AS sid FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        pqcent AS (SELECT CAST(row_number() OVER (ORDER BY sid) - 1 AS INTEGER) AS c, sid
          FROM pqsrc),
        cdim AS (SELECT p.c, r.i, r.s, r.x AS cx FROM pqcent p JOIN rdim r ON r.id = p.sid),
        dsub AS (SELECT r.id, r.s, cd.c,
            CAST(sum(CAST(floor((r.x - cd.cx) * (r.x - cd.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d
          FROM rdim r JOIN cdim cd USING (i, s) GROUP BY 1, 2, 3),
        codes AS (SELECT id, s, c AS code FROM (
            SELECT id, s, c, row_number() OVER (PARTITION BY id, s ORDER BY d, c) AS rn
            FROM dsub) WHERE rn = 1),
        codesl AS (SELECT codes.id, ca.list_id, codes.s, codes.code
          FROM codes JOIN corpus_assign ca ON ca.neighbor_id = codes.id),
        pdim AS (
          SELECT t.vec_id AS probe_id, pa.list_id, t.ui - 1 AS i,
            ((t.ui - 1) * 4) // len(t.embedding) AS s,
            CAST(t.embedding[t.ui] AS DOUBLE) AS x0
          FROM (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS ui, embedding
                FROM embeddings WHERE vec_id < 5) t
          JOIN probe_assign pa ON pa.probe_id = t.vec_id),
        prdim AS (SELECT probe_id, list_id, i, s, x0 - gx AS x
          FROM pdim JOIN gdim USING (list_id, i)),
        pdsub AS (SELECT probe_id, list_id, s, cd.c,
            CAST(sum(CAST(floor((x - cd.cx) * (x - cd.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d
          FROM prdim JOIN cdim cd USING (i, s) GROUP BY 1, 2, 3, 4),
        adc AS (SELECT p.probe_id, cl.id AS neighbor_id, CAST(sum(p.d) AS BIGINT) AS dist
          FROM codesl cl JOIN pdsub p
            ON p.list_id = cl.list_id AND p.s = cl.s AND p.c = cl.code
          WHERE cl.id <> p.probe_id
          GROUP BY 1, 2),
        kf AS (SELECT probe_id, neighbor_id, dist,
            row_number() OVER (PARTITION BY probe_id ORDER BY dist, neighbor_id) AS rn
          FROM adc)"""

  /** DuckDB mirror of the e21 sweep: the shared IVF assignment CTEs, the
    * brute-force truth, then one candidate→rank→recall chain per probe
    * budget, unioned. */
  private lazy val ivfSweepOracle: String = {
    val shared = s"""WITH cent AS (
          SELECT vec_id AS list_src, embedding AS cvec
          FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        centn AS (
          SELECT cvec, CAST(row_number() OVER (ORDER BY list_src) - 1 AS INTEGER) AS list_id
          FROM cent),
        scored AS (
          SELECT e.vec_id AS id, c.list_id,
            CAST(${qdotSql("e.embedding", "c.cvec")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("e.embedding", "e.embedding")} AS DOUBLE)
                     * CAST(${qdotSql("c.cvec", "c.cvec")} AS DOUBLE)) AS score
          FROM embeddings e, centn c),
        corpus_assign AS (
          SELECT id AS neighbor_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored) WHERE rn = 1),
        pt AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 5),
        dt AS (SELECT probe_id, e.vec_id AS neighbor_id,
                 ${qdotSql("pe", "e.embedding")} AS qd,
                 ${qdotSql("pe", "pe")} AS qa,
                 ${qdotSql("e.embedding", "e.embedding")} AS qb
               FROM pt, embeddings e WHERE e.vec_id <> probe_id),
        rt AS (SELECT probe_id, neighbor_id,
                 CAST(qd AS DOUBLE) / sqrt(CAST(qa AS DOUBLE) * CAST(qb AS DOUBLE)) AS sim
               FROM dt),
        kt AS (SELECT probe_id, neighbor_id,
                 row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
               FROM rt),
        truth AS (SELECT probe_id, neighbor_id FROM kt WHERE rn <= 5),
        nt AS (SELECT probe_id, count(*) AS n_truth FROM truth GROUP BY 1)"""
    val budgets = Seq(1, 2, 4)
    val perBudget = budgets.map { np =>
      s""",
        pa$np AS (SELECT id AS probe_id, list_id FROM (
            SELECT id, list_id,
              row_number() OVER (PARTITION BY id ORDER BY score DESC, list_id) AS rn
            FROM scored WHERE id < 5) WHERE rn <= $np),
        cand$np AS (SELECT DISTINCT probe_id, neighbor_id
          FROM corpus_assign JOIN pa$np USING (list_id)
          WHERE neighbor_id <> probe_id),
        wv$np AS (SELECT cand$np.probe_id, cand$np.neighbor_id,
            p.embedding AS pe, n.embedding AS ne
          FROM cand$np JOIN embeddings p ON p.vec_id = cand$np.probe_id
                       JOIN embeddings n ON n.vec_id = cand$np.neighbor_id),
        r$np AS (SELECT probe_id, neighbor_id,
            CAST(${qdotSql("pe", "ne")} AS DOUBLE)
              / sqrt(CAST(${qdotSql("pe", "pe")} AS DOUBLE) * CAST(${qdotSql("ne", "ne")} AS DOUBLE)) AS sim
          FROM wv$np),
        k$np AS (SELECT probe_id, neighbor_id,
            row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
          FROM r$np),
        ann$np AS (SELECT probe_id, neighbor_id FROM k$np WHERE rn <= 5),
        h$np AS (SELECT t.probe_id, count(*) AS hits
          FROM truth t JOIN ann$np a USING (probe_id, neighbor_id) GROUP BY 1)"""
    }.mkString
    val selects = budgets.map { np =>
      s"""SELECT $np AS probe_budget, nt.probe_id, nt.n_truth,
          coalesce(h$np.hits, CAST(0 AS BIGINT)) AS hits,
          ${graft.operators.QueryDsl.ratio6Sql(s"coalesce(h$np.hits, 0)", "nt.n_truth")} AS recall
        FROM nt LEFT JOIN h$np USING (probe_id)"""
    }.mkString("\n        UNION ALL\n        ")
    s"$shared$perBudget\n        $selects\n        ORDER BY probe_budget, probe_id"
  }

  /** DuckDB mirror of `Similarity.lshBucketRows(portable = true)`: CTEs
    * ending in `buck(vec_id, tbl, bucket)` over the embeddings table —
    * md5-parity sign matrix, fixed-point 1e9 projections, sign-bit packing.
    */
  private def bucketsSql(nTables: Int, bitsPerTable: Int): String = {
    val nPlanes = nTables * bitsPerTable
    s"""WITH planes AS (
        SELECT p, i,
          CASE WHEN CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 1
               THEN 1 ELSE -1 END AS sgn
        FROM (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS p),
             (SELECT unnest(generate_series(0, 63)) AS i)),
      ev AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS ui, embedding
             FROM embeddings),
      qx AS (SELECT vec_id, ui - 1 AS i,
               CAST(floor(CAST(embedding[ui] AS DOUBLE) * 1e9) AS BIGINT) AS qx
             FROM ev),
      proj AS (SELECT vec_id, p, SUM(sgn * qx) AS proj
               FROM qx JOIN planes USING (i) GROUP BY 1, 2),
      buck AS (SELECT vec_id, p // $bitsPerTable AS tbl,
                 SUM(CASE WHEN proj > 0 THEN (1 << (p % $bitsPerTable)) ELSE 0 END) AS bucket
               FROM proj GROUP BY 1, 2)"""
  }
}
