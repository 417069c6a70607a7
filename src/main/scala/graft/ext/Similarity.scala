package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design (100 TB):
  *  - the baseline is brute-force cosine top-k with the PROBE side
  *    broadcast: the corpus is scanned once, partition-local, no corpus
  *    shuffle. The `row_number <= k` filter is planned as a TWO-PHASE
  *    WindowGroupLimit (Catalyst's InferWindowGroupLimit rule): a partial
  *    pass keeps only k candidates per probe per input partition BEFORE
  *    the exchange, so the shuffle carries ~partitions*probes*k rows, not
  *    every candidate pair — PlanAuditSpec pins both phases;
  *  - the scale path is hyperplane-LSH bucketing: each vector maps to a
  *    small integer bucket; same-bucket (or multi-probe neighbor-bucket)
  *    join restricts the candidate set, so the cross product never forms;
  *  - all arithmetic is built-in array expressions (zip_with/aggregate) —
  *    codegen-compatible, no UDF, no Python boundary.
  */
object Similarity {

  /** Double-precision dot product of two float vectors — a native codegen'd
    * expression (see [[graft.functions.DotProduct]]); identical left-to-right
    * summation to the `aggregate`/`zip_with` fold it replaced, minus the
    * interpreted higher-order-function overhead. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantized (fixed-point, 1e-12) dot product as a BIGINT sum — exactly
    * reproducible regardless of partitioning/engine, because integer
    * addition is associative where float addition is not. Used where
    * results must verify bit-for-bit outside Spark; magnitudes up to
    * |x*y| ~ 1e4 stay far from Long overflow at dim <= 1e3. Codegen'd
    * (see [[graft.functions.QuantizedDotProduct]]). */
  def quantizedDot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.quantizedDotProduct(a, b)

  /** Cosine from quantized components — deterministic across engines. */
  def quantizedCosine(a: Column, b: Column): Column =
    quantizedDot(a, b).cast("double") /
      sqrt(quantizedDot(a, a).cast("double") * quantizedDot(b, b).cast("double"))

  /** Brute-force cosine top-k: for every probe row, the `k` nearest corpus
    * rows. Probes are broadcast; ranking is deterministic (similarity desc,
    * then corpus id). Self-matches (same id) are excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      deterministic: Boolean = false): DataFrame = {
    // norms are attached per VECTOR (narrow projection, once per row), not
    // recomputed per pair — at candidate-degree d that removes 2d of the
    // 3d dot products; identical values, so oracles are unaffected
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      selfDot(col(vecCol), deterministic).as("probe_sq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
      selfDot(col(vecCol), deterministic).as("neighbor_sq"))
    val sim = pairSim(col("probe_vec"), col("probe_sq"),
      col("neighbor_vec"), col("neighbor_sq"), deterministic)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("sim", sim)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }

  /** Squared self-norm in the scoring domain: quantized BIGINT when
    * deterministic, plain double otherwise. */
  private def selfDot(vec: Column, deterministic: Boolean): Column =
    if (deterministic) quantizedDot(vec, vec) else dot(vec, vec)

  /** Cosine from pre-attached squared norms — same value as
    * `quantizedCosine`/`cosine`, one cross-dot per pair instead of three. */
  private def pairSim(va: Column, qa: Column, vb: Column, qb: Column,
      deterministic: Boolean): Column =
    if (deterministic)
      quantizedDot(va, vb).cast("double") / sqrt(qa.cast("double") * qb.cast("double"))
    else dot(va, vb) / sqrt(qa * qb)

  // ------------------------------------------------------ hyperplane LSH

  /** Deterministic pseudo-random hyperplane component in {-1, +1} for
    * (plane, dimension), derived from xxhash64 — no stored model. */
  private def planeComponent(plane: Int, dimIdx: Column): Column =
    when(xxhash64(lit(plane), dimIdx).bitwiseAND(1L) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-bit LSH bucket id from `nPlanes` random hyperplanes; `seed`
    * selects an independent plane family (one per hash table). */
  def lshBucket(vec: Column, nPlanes: Int = 12, seed: Int = 0): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bits = (0 until nPlanes).map { plane =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * planeComponent(seed * 1024 + plane, i)),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1), plane)).otherwise(lit(0))
    }
    bits.reduce(_.bitwiseOR(_)).cast("int")
  }

  /** One bucket per hash table: `nTables` independent sign-LSH codes. */
  def lshBucketTables(vec: Column, nTables: Int, bitsPerTable: Int): Column =
    array((0 until nTables).map(t => lshBucket(vec, bitsPerTable, seed = t + 1)): _*)

  /** DataFrame-level multi-table bucket computation — the SCALE path.
    * Vectors are exploded to (id, dim, x) and every plane projection is a
    * plain `sum` aggregate, so the whole computation whole-stage-codegens
    * with map-side combine (the shuffle carries one projection row per doc
    * per partition, not the vectors). The Column-expression variant above
    * folds arrays with higher-order functions, which Spark evaluates
    * interpreted — measured ~4x slower; keep it for expression contexts.
    * Returns (id, buckets array<int>), one bucket per table. */
  def lshBucketsDf(df: DataFrame, idCol: String, vecCol: String,
      nTables: Int, bitsPerTable: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("i", "x")))
    // fixed-point like lshBucketRows: quantize to BIGINT before the signed
    // sum so the bucket id is exact integer arithmetic — a double sum's
    // rounding depends on aggregation order, so a near-zero projection
    // could land on either side of the sign test run-to-run
    val projections = (0 until nTables * bitsPerTable).map { j =>
      val seed = (j / bitsPerTable + 1) * 1024 + (j % bitsPerTable)
      sum(floor(col("x").cast("double") * lit(1e9)).cast("long") *
        when(xxhash64(lit(seed), col("i")).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"p$j")
    }
    exploded.groupBy("id")
      .agg(projections.head, projections.tail: _*)
      .select(col("id"), array((0 until nTables).map { t =>
        (0 until bitsPerTable).map { b =>
          when(col(s"p${t * bitsPerTable + b}") > 0, shiftleft(lit(1), b)).otherwise(lit(0))
        }.reduce(_.bitwiseOR(_)).cast("int")
      }: _*).as("buckets"))
  }

  /** Bucket assignments as (id, tbl, bucket) rows — the form the candidate
    * joins consume directly (no array materialization / re-explode).
    *
    * Projections are fixed-point: each component is quantized to
    * `floor(x * 1e9)` BIGINT before the signed sum, so bucket ids are exact
    * integer arithmetic — identical on any engine or partitioning (a double
    * sum's rounding depends on order; an integer sum's doesn't). With
    * `portable=true` the hyperplane sign matrix derives from md5 parity
    * (reproducible in the DuckDB oracle); otherwise from xxhash64 (cheaper).
    *
    * Plan shape: the (plane, dim, sign) matrix is nPlanes x dim rows, built
    * once and broadcast; vectors posexplode to (id, i, qx) and join it —
    * all narrow, whole-stage-codegen'd, with map-side partial aggregation,
    * so the only shuffle carries (id, plane, partialSum) rows: ~nPlanes
    * small rows per vector, never the vectors themselves.
    */
  def lshBucketRows(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nTables: Int,
      bitsPerTable: Int,
      portable: Boolean = false,
      knownDims: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    // dimensionality from the first NON-NULL vector (one LIMIT-1 job,
    // never a full scan); vectors are assumed uniform-width, like every
    // ANN operator here. Probing an arbitrary first row would read a
    // NULL vector's size as null and silently drop EVERY row's
    // candidates — only a frame with no non-null vector at all (a
    // drained incremental batch, an empty probe set) returns the empty
    // bucket frame instead of crashing on head(). Callers that already
    // validated the batch (AnnIndex.checkDims returns the validated
    // width, guaranteeing non-empty/non-null) pass `knownDims` and skip
    // the probe job.
    val dim = knownDims.getOrElse {
      val dimRow = df.filter(col(vecCol).isNotNull)
        .select(size(col(vecCol)).as("d")).limit(1).collect()
      if (dimRow.isEmpty)
        return df.select(col(idCol).as("id")).limit(0)
          .withColumn("tbl", lit(0)).withColumn("bucket", lit(0))
      dimRow(0).getInt(0)
    }
    val nPlanes = nTables * bitsPerTable
    val planeDim = spark.range(nPlanes.toLong).select(col("id").cast("int").as("p"))
      .crossJoin(spark.range(dim.toLong).select(col("id").cast("int").as("i")))
    val parityBit =
      if (portable)
        conv(substring(md5(concat(col("p").cast("string"), lit(":"), col("i").cast("string"))), 1, 1), 16, 10)
          .cast("long") % 2L
      else {
        val seed = ((col("p") / lit(bitsPerTable)).cast("int") + 1) * 1024 +
          pmod(col("p"), lit(bitsPerTable))
        xxhash64(seed, col("i")).bitwiseAND(1L)
      }
    val signs = planeDim.select(col("p"), col("i"),
      when(parityBit === 1L, 1L).otherwise(-1L).as("sgn"))
    val exploded = Parallelism.widen(df.select(col(idCol).as("id"), col(vecCol)))
      .select(col("id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("qx", floor(col("x").cast("double") * lit(1e9)).cast("long"))
    exploded.join(broadcast(signs), Seq("i"))
      .groupBy(col("id"), col("p"))
      .agg(sum(col("sgn") * col("qx")).as("proj"))
      .withColumn("tbl", (col("p") / lit(bitsPerTable)).cast("int"))
      .withColumn("bit", pmod(col("p"), lit(bitsPerTable)).cast("int"))
      .groupBy("id", "tbl")
      .agg(sum(when(col("proj") > 0, call_function("shiftleft", lit(1L), col("bit")))
        .otherwise(0L)).cast("int").as("bucket"))
  }

  /** Approximate top-k via multi-table hyperplane LSH.
    *
    * Candidate recall for a neighbor at angle θ is
    * 1 - (1 - p^b)^L with p = 1 - θ/π — tune (L=nTables, b=bitsPerTable)
    * to the similarity level that matters; b should grow ~log2(corpus) so
    * per-bucket candidate counts stay bounded as data scales.
    *
    * Plan shape at scale: corpus hashed once (narrow), shuffle carries only
    * (id, table, bucket) pairs; candidate ids are deduped BEFORE vectors are
    * re-attached, so wide embedding rows cross the network only for actual
    * candidates; exact cosine + per-probe top-k windows finish the job.
    */
  def annTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int = 8,
      bitsPerTable: Int = 4,
      portable: Boolean = false): DataFrame =
    annTopKImpl(corpus, probes, idCol, vecCol, k, nTables, bitsPerTable,
      portable, probeFlips = Seq(0))

  /** Shared core of [[annTopK]] / [[annTopKMultiprobe]] — ONE copy of the
    * corpus hashing, candidate join, vector re-attach and per-probe top-k
    * tail; the variants differ only in the probe-side bucket expansion
    * (`probeFlips`: XOR masks, 0 = the exact bucket). */
  private def annTopKImpl(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int,
      bitsPerTable: Int,
      portable: Boolean,
      probeFlips: Seq[Int]): DataFrame = {
    val c = lshBucketRows(corpus, idCol, vecCol, nTables, bitsPerTable, portable)
      .select(col("id").as("neighbor_id"), col("tbl"), col("bucket"))
    val p0 = lshBucketRows(probes, idCol, vecCol, nTables, bitsPerTable, portable)
      .select(col("id").as("probe_id"), col("tbl"), col("bucket"))
    val p =
      if (probeFlips == Seq(0)) p0
      else p0
        .withColumn("__flip", explode(array(probeFlips.map(lit): _*)))
        .withColumn("bucket", col("bucket").bitwiseXOR(col("__flip")).cast("int"))
        .drop("__flip")
    val pairs = c.join(broadcast(p), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")
      .distinct()
    // norms attached per vector (once), not per candidate pair
    val withVecs = pairs
      .join(broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        selfDot(col(vecCol), portable).as("probe_sq"))), Seq("probe_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
        selfDot(col(vecCol), portable).as("neighbor_sq")), Seq("neighbor_id"))
    val sim = pairSim(col("probe_vec"), col("probe_sq"),
      col("neighbor_vec"), col("neighbor_sq"), portable)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    withVecs
      .withColumn("sim", sim)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }

  /** [[annTopK]] with MULTIPROBE: each probe searches its exact bucket
    * AND every 1-bit perturbation of it, per table — the standard
    * recall/latency knob (Lv et al. 2007, multi-probe LSH): near
    * neighbors that land one sign-bit away are recovered WITHOUT adding
    * hash tables (more tables = more stored index; more probes = only
    * more query-side candidates). Candidate volume grows by at most
    * (bitsPerTable + 1)x on the probe side — the corpus side is
    * untouched, so at 100 TB the index neither grows nor re-shuffles.
    * The candidate set is a superset of [[annTopK]]'s, so recall@k is
    * non-decreasing. */
  def annTopKMultiprobe(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int = 8,
      bitsPerTable: Int = 4,
      portable: Boolean = false): DataFrame =
    // probe buckets expand to {bucket} ∪ {bucket XOR 2^b}: flip 0 keeps
    // the exact bucket, so the expansion strictly contains the
    // single-probe candidate set
    annTopKImpl(corpus, probes, idCol, vecCol, k, nTables, bitsPerTable,
      portable, probeFlips = 0 +: (0 until bitsPerTable).map(1 << _))

  // ----------------------------------------------------------------- IVF

  /** Deterministic IVF coarse quantizer: the centroid set is the `nLists`
    * corpus vectors ranked first by md5 of their id — a reproducible
    * pseudo-random sample (any engine re-derives it), standing in for the
    * k-means codebook a trained index would load. At 100 TB the codebook is
    * tiny either way (nLists vectors) and travels as a broadcast.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String, nLists: Int): DataFrame =
    df.select(col(idCol).as("list_src"), col(vecCol).as("cvec"))
      .orderBy(md5(col("list_src").cast("string")), col("list_src"))
      .limit(nLists)
      .orderBy(col("list_src"))
      .withColumn("list_id", (row_number().over(Window.orderBy(col("list_src"))) - 1).cast("int"))

  /** Nearest-centroid assignment per vector: (id, list_id).
    *
    * Plan shape at scale: centroids broadcast, corpus scanned once — each
    * vector emits nLists (id, list, score) rows that partial-aggregate
    * map-side into one `max(struct(score, list))` row per id, so the only
    * shuffle carries one tiny struct per vector, never embeddings. The
    * quantized cosine makes the argmax exact integer/IEEE math — identical
    * in any engine; ties break to the LOWEST list id. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, topN: Int = 1): DataFrame = {
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("vsq", quantizedDot(col("vec"), col("vec"))) // once per vector
      .crossJoin(broadcast(centroids.select(col("list_id"), col("cvec"))
        .withColumn("csq", quantizedDot(col("cvec"), col("cvec"))))) // once per centroid
      .withColumn("score", pairSim(col("vec"), col("vsq"),
        col("cvec"), col("csq"), deterministic = true))
    if (topN == 1) {
      scored
        .groupBy("id")
        .agg(max(struct(col("score"), (-col("list_id")).as("neg_list"))).as("best"))
        .select(col("id"), (-col("best.neg_list")).cast("int").as("list_id"))
    } else {
      val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("list_id"))
      scored
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topN)
        .select(col("id"), col("list_id"))
    }
  }

  /** Approximate top-k via an IVF inverted index: corpus vectors are
    * partitioned into `nLists` Voronoi cells of the coarse quantizer; each
    * probe searches only its `nProbe` closest cells.
    *
    * Plan shape at scale: assignment shuffles one small row per vector
    * (see `ivfAssign`); the candidate join is corpus-assignments ⨝
    * broadcast(probe lists) on `list_id` — the corpus side would be
    * list-partitioned storage in a persisted index, making this a pruned
    * scan of nProbe/nLists of the data; vectors re-attach only for
    * candidate ids. Recall tunes with nProbe/nLists independently of
    * corpus size, the IVF trade-off LSH banding can't express.
    *
    * `corpusFilter` is hybrid (filtered) search in its PRE-filter shape:
    * the predicate restricts the corpus side BEFORE assignment, candidate
    * generation, and ranking, so the top-k is computed among survivors —
    * every probe still gets k results when k survivors share its cells,
    * where post-filtering a k-list would return fewer (or none) under a
    * selective predicate. The codebook stays trained on the FULL corpus:
    * an index is built once, query-time predicates are not known at build
    * time, and cell geometry must not shift per query. At scale the
    * predicate is a plain column filter that reaches the parquet scan
    * (PushedFilters / row-group stats pruning) of the cell-pruned files —
    * metadata-selective queries skip both non-probed cells AND
    * non-matching row groups without touching a vector. */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 8,
      nProbe: Int = 3,
      corpusFilter: Option[Column] = None): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, nLists)
    val candidates = corpusFilter.map(corpus.filter).getOrElse(corpus)
    val corpusLists = ivfAssign(candidates, idCol, vecCol, centroids)
      .select(col("id").as("neighbor_id"), col("list_id"))
    val probeLists = ivfAssign(probes, idCol, vecCol, centroids, topN = nProbe)
      .select(col("id").as("probe_id"), col("list_id"))
    val pairs = corpusLists.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")
      .distinct()
    // norms attached per vector (once), not per candidate pair
    val withVecs = pairs
      .join(broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        quantizedDot(col(vecCol), col(vecCol)).as("probe_sq"))), Seq("probe_id"))
      .join(candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
        quantizedDot(col(vecCol), col(vecCol)).as("neighbor_sq")), Seq("neighbor_id"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    withVecs
      .withColumn("sim", pairSim(col("probe_vec"), col("probe_sq"),
        col("neighbor_vec"), col("neighbor_sq"), deterministic = true))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }

  // ------------------------------------------ 8-bit scalar quantization

  /** Per-dimension quantization grid over the corpus: `(min, step)` with
    * `step = (max - min)/256`. Collected driver-side — dimensions are
    * bounded (64-4096) so this is a KB-sized model regardless of corpus
    * size, the SQ analogue of the IVF codebook. Pure min/max — identical
    * on any engine. */
  def sqDimStats(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
    // the arrays are filled POSITIONALLY, so the dimension indices must be
    // dense 0..d-1 — ragged vectors (a dimension missing from every row)
    // would silently misalign the whole grid instead of failing
    rows.iterator.zipWithIndex.foreach { case (r, idx) =>
      require(r.getInt(0) == idx,
        s"sqDimStats: non-contiguous dimension indices (expected $idx, " +
          s"got ${r.getInt(0)}) — ragged vectors in '$vecCol'")
    }
    (rows.map(_.getDouble(1)), rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 256.0))
  }

  /** 8-bit scalar-quantized codes: (id, codes BINARY) — one byte per
    * dimension, 4× smaller than `array<float>` on disk and through every
    * shuffle (16× vs Tungsten's 4-byte array elements). The codegen'd
    * encode (see [[graft.functions.SqEncodeBytes]]) uses only IEEE double
    * ops, so codes are engine-portable given the same grid. */
  def sqEncode(df: DataFrame, idCol: String, vecCol: String,
      mins: Array[Double], steps: Array[Double]): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.VectorExpressions.sqEncodeBytes(col(vecCol),
        array(mins.map(lit).toSeq: _*), array(steps.map(lit).toSeq: _*)).as("codes"))

  /** Brute-force L2 top-k over SQ-compressed codes — the memory-reduction
    * scale path: the corpus scan touches 1 byte/dim instead of 4, the
    * probe side broadcasts codes not vectors, and scoring is exact integer
    * arithmetic ([[graft.functions.ByteCodeL2]]), reproducible on any
    * engine. `qdist` is squared L2 in code space (ascending = nearest);
    * ranking ties break to the lowest neighbor id. Spark plans the
    * rank<=k filter as a two-phase WindowGroupLimit, so the per-partition
    * top-k reduces map-side before the per-probe shuffle. */
  def sqTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val (mins, steps) = sqDimStats(corpus, vecCol)
    val c = sqEncode(corpus, idCol, vecCol, mins, steps)
      .select(col("id").as("neighbor_id"), col("codes").as("neighbor_codes"))
    val p = sqEncode(probes, idCol, vecCol, mins, steps)
      .select(col("id").as("probe_id"), col("codes").as("probe_codes"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("qdist"), col("neighbor_id"))
    c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("qdist",
        graft.functions.VectorExpressions.byteCodeL2(col("probe_codes"), col("neighbor_codes")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "qdist")
  }

  // ------------------------------------------------------------- k-means

  /** Deterministic, engine-portable Lloyd k-means over an embedding
    * column: the semantic-clustering primitive behind SemDeDup-style
    * dedup, stratified corpus mixing, and IVF codebook training. Returns
    * `(id, cluster, qdist)` — the assignment under the centroids after
    * `iters` update rounds, `qdist` the quantized squared-L2 to the won
    * centroid.
    *
    * Portability is total, not probabilistic: init is the md5-ranked
    * corpus sample (any engine re-derives it — same trick as
    * [[ivfCentroids]]); distances are `sum(floor((x-c)²·1e12))` BIGINTs;
    * centroid updates quantize member dims to integer micro-units, sum
    * exactly, and round half-up via `floor((2S+n)/(2n))` — all IEEE
    * double/integer ops with no transcendentals, so every iteration's
    * centroids (and therefore the final assignment) are bit-identical on
    * any engine. Ties break to the lowest cluster id.
    *
    * Plan shape at 100 TB: vectors explode ONCE to (id, dim, x, micro)
    * and materialize (every iteration reuses the frame); each iteration
    * is {broadcast centroid join → map-side partial-aggregated
    * (id, cluster) distance sum → min-struct argmin (one tiny row per
    * vector through the shuffle) → (cluster, dim) micro-sum}. Nothing
    * wider than k·dims ever sits on the driver, and no iteration shuffles
    * an embedding. */
  def kmeansAssignments(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val ex = Parallelism.widen(df)
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "xr")))
      .select(col("id"), col("i"), col("xr").cast("double").as("x"),
        floor(col("xr").cast("double") * lit(1e6)).cast("long").as("micro"))
      .transform(Parallelism.materialize(_))
    var cent: DataFrame = df
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(k)
      .withColumn("cluster", (row_number().over(Window.orderBy(col("cid"))) - 1).cast("int"))
      .select(col("cluster"), posexplode(col("cv")).as(Seq("i", "cr")))
      .select(col("cluster"), col("i"), col("cr").cast("double").as("c"))
    def assign(cent: DataFrame): DataFrame =
      ex.join(broadcast(cent), Seq("i"))
        .withColumn("d", col("x") - col("c"))
        .withColumn("term", floor(col("d") * col("d") * lit(1e12)).cast("long"))
        .groupBy(col("id"), col("cluster"))
        .agg(sum(col("term")).as("dist"))
        .groupBy(col("id"))
        .agg(min(struct(col("dist"), col("cluster"))).as("best"))
        .select(col("id"), col("best.cluster").as("cluster"), col("best.dist").as("qdist"))
    for (_ <- 1 to iters) {
      // rematerialize: barrier truncates per-iteration lineage AND (in
      // persist mode) releases the superseded centroid frame
      cent = Parallelism.rematerialize(assign(cent)
        .join(ex, Seq("id"))
        .groupBy(col("cluster"), col("i"))
        .agg(sum(col("micro")).as("s"), count(lit(1)).as("n"))
        // round-half-up(S/n) for any sign: floor((2S+n)/(2n)). Exact
        // while 2S+n < 2^53 (true up to ~1e9 members/cluster at micro
        // scale); beyond that the IEEE ops are still the same on every
        // engine, so cross-engine parity holds even where the label
        // "half-up" stops being exact.
        .select(col("cluster"), col("i"),
          (floor((col("s") * 2 + col("n")).cast("double") / (col("n") * 2).cast("double"))
            .cast("double") / lit(1e6)).as("c")), cent)
    }
    assign(cent)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by k-means clustering + within-cluster cosine — the
    * embedding-space analogue of MinHash dedup, catching paraphrases and
    * template variants that share no n-grams. A row is a duplicate when a
    * LOWER-id member of its cluster is cosine-similar above `threshold`;
    * `dup_of` is the smallest such id (deterministic representative
    * choice, like `exactDedup`'s min-id rule).
    *
    * Scale shape: the pair join is WITHIN clusters only — never all-pairs
    * across the corpus. At 100 TB you size `k ≈ n / targetClusterSize`
    * so each cluster is a bounded candidate set (the paper uses 50k
    * clusters for 1.3e9 docs), and the join shuffles on the cluster id.
    * Clustering itself is [[kmeansAssignments]] — broadcast centroids,
    * nothing wider than k·dims on the driver; similarity is the
    * quantized-integer cosine, so results are engine-portable. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val withVec = kmeansAssignments(df, idCol, vecCol, k, iters)
      .select(col("id"), col("cluster"))
      .join(df.select(col(idCol).as("id"), col(vecCol).as("__v")), "id")
      .withColumn("__q", quantizedDot(col("__v"), col("__v")))
      .transform(Parallelism.materialize(_)) // feeds BOTH sides of the pair join + output
    val a = withVec.select(col("cluster"), col("id").as("__ida"),
      col("__v").as("__va"), col("__q").as("__qa"))
    val b = withVec.select(col("cluster"), col("id").as("__idb"),
      col("__v").as("__vb"), col("__q").as("__qb"))
    val dupOf = a.join(b, "cluster")
      .filter(col("__ida") < col("__idb"))
      .withColumn("__sim", quantizedDot(col("__va"), col("__vb")).cast("double") /
        sqrt(col("__qa").cast("double") * col("__qb").cast("double")))
      .filter(col("__sim") >= threshold)
      .groupBy(col("__idb")).agg(min(col("__ida")).as("dup_of"))
      .withColumnRenamed("__idb", "id")
    withVec.select(col("id"), col("cluster"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
  }

  /** Product-quantization ANN (Jégou et al. 2011): split vectors into `m`
    * subspaces, encode each subvector as its nearest sub-codebook
    * centroid id (one SMALL int per subspace instead of dims floats), and
    * score probes against CODES via asymmetric distance computation (ADC)
    * — probe-to-centroid subdistances are computed once per (probe,
    * subspace, centroid) and summed per code, so the corpus-side scan
    * never touches a vector again after encoding.
    *
    * Engine-portable by the same discipline as [[kmeansAssignments]]:
    * md5-ranked codebook sample, `floor((x-c)²·1e12)` BIGINT
    * subdistances, integer-exact micro-unit centroid updates, ties to
    * the lowest centroid/id. `iters = 0` keeps the codebook at the md5
    * sample (what the DuckDB oracle reproduces without Lloyd
    * unrolling); `iters > 0` runs per-subspace Lloyd training — all m
    * subspaces train in the SAME assign/update jobs, the subspace id is
    * just a grouping key, so training m codebooks costs one k-means, not
    * m of them.
    *
    * Scale shape: encode is one broadcast-codebook join + argmin per
    * (row, subspace) — identical cost to one k-means assign step; ADC
    * joins the m·codebookSize probe subdistance table (tiny, broadcast)
    * to corpus CODES — m BIGINTs per row through the shuffle, never
    * embeddings. */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, codebookSize: Int = 16,
      iters: Int = 0)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(m > 0 && codebookSize > 0 && iters >= 0,
      "m and codebookSize must be positive, iters non-negative")
    // ragged vectors would silently drop dimensions from the (i, s)
    // codebook join and bias every code/distance — fail loudly instead
    // (same contract as sqDimStats/SqEncodeBytes). Column-pruned scans.
    val cd = corpus.agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!cd.isNullAt(0) && cd.getInt(0) == cd.getInt(1),
      s"pqTopK: ragged corpus vectors in '$vecCol' (dims ${cd.get(0)}..${cd.get(1)})")
    val pd = probes.agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(pd.isNullAt(0) || (pd.getInt(0) == cd.getInt(0) && pd.getInt(1) == cd.getInt(0)),
      s"pqTopK: probe dims ${pd.get(0)}..${pd.get(1)} != corpus dims ${cd.get(0)}")
    // micro units feed the integer-exact centroid updates, as in kmeans.
    // The explode materializes only when training will REUSE it (each
    // iteration's assign + update, plus the final encode); at iters=0 the
    // single consumer makes an eager corpus-wide checkpoint pure cost
    val exCorpus0 = pqExplode(corpus, idCol, vecCol, m)
      .withColumn("micro", floor(col("x") * lit(1e6)).cast("long"))
    val exCorpus = if (iters > 0) exCorpus0.transform(Parallelism.materialize(_)) else exCorpus0
    val cent = pqTrainCentroids(corpus, exCorpus, idCol, vecCol, m, codebookSize, iters)
    val codes = pqAssign(exCorpus, cent)
    // probes are small by this operator's contract → force-broadcast;
    // PqIndex.query passes a size-gated hint instead
    val probeSub = broadcast(pqProbeSubDists(probes, idCol, vecCol, m, cent))
    pqAdcTopK(codes, probeSub, k)
  }

  /** (id, dim, subspace, x) explode for PQ: s = (i·m) div dims —
    * contiguous dim blocks (shared by [[pqTopK]] and [[PqIndex]]). */
  private[ext] def pqExplode(df: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = df
    .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "xr")),
      size(col(vecCol)).as("__dims"))
    .select(col("id"), col("i"), expr(s"(i * $m) DIV __dims").as("s"),
      col("xr").cast("double").as("x"))

  /** Per-(row, subspace, centroid) quantized subdistance of an exploded
    * frame against a (c, i, s, cx) codebook (broadcast — KB-sized). */
  private[ext] def pqSubDists(ex: DataFrame, cb: DataFrame): DataFrame = ex
    .join(broadcast(cb), Seq("i", "s"))
    .withColumn("term", floor((col("x") - col("cx")) * (col("x") - col("cx")) * lit(1e12)).cast("long"))
    .groupBy(col("id"), col("s"), col("c"))
    .agg(sum(col("term")).as("d"))

  /** PQ encode: nearest sub-codebook centroid per (row, subspace) —
    * (id, s, code), ties to the lowest centroid id. */
  private[ext] def pqAssign(ex: DataFrame, cb: DataFrame): DataFrame =
    pqSubDists(ex, cb)
      .groupBy(col("id"), col("s"))
      .agg(min(struct(col("d"), col("c"))).as("best"))
      .select(col("id"), col("s"), col("best.c").as("code"))

  /** The (c, i, s, cx) sub-codebooks: md5-ranked corpus sample, then
    * `iters` rounds of per-subspace Lloyd — each subspace's codebook
    * trains on its member subvectors independently, all m trainings
    * riding ONE assign + ONE update job per iteration (subspace is just
    * a grouping key). `exCorpus` must carry the `micro` column and be
    * materialized by the caller when iters > 0 (it is consumed 2×/iter). */
  private[ext] def pqTrainCentroids(corpus: DataFrame, exCorpus: DataFrame,
      idCol: String, vecCol: String, m: Int, codebookSize: Int,
      iters: Int)(implicit settings: graft.conf.GraftSettings): DataFrame = {
    var cent: DataFrame = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .orderBy(md5(col("cid").cast("string")), col("cid"))
      .limit(codebookSize)
      .withColumn("c", (row_number().over(Window.orderBy(col("cid"))) - 1).cast("int"))
      .select(col("c"), posexplode(col("cv")).as(Seq("i", "cxr")), size(col("cv")).as("__dims"))
      .select(col("c"), col("i"), expr(s"(i * $m) DIV __dims").as("s"),
        col("cxr").cast("double").as("cx"))
      // k·dims rows; unmaterialized, every consuming job re-runs the
      // corpus-wide md5 top-k that derives it
      .transform(Parallelism.materialize(_))
    for (_ <- 1 to iters) {
      // rematerialize: lineage barrier + persist-mode release of the
      // superseded per-subspace codebook
      cent = Parallelism.rematerialize(pqAssign(exCorpus, cent)
        .join(exCorpus, Seq("id", "s"))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(sum(col("micro")).as("__msum"), count(lit(1)).as("__n"))
        .select(col("code").as("c"), col("i"), col("s"),
          (floor((col("__msum") * 2 + col("__n")).cast("double") / (col("__n") * 2).cast("double"))
            .cast("double") / lit(1e6)).as("cx")), cent)
    }
    cent
  }

  /** Probe-side ADC table: subdistance of each probe to EVERY centroid of
    * every subspace, renamed for [[pqAdcTopK]]'s code join. Tiny
    * (|probes| × m × codebookSize rows) — always broadcast. */
  private[ext] def pqProbeSubDists(probes: DataFrame, idCol: String,
      vecCol: String, m: Int, cent: DataFrame): DataFrame =
    pqSubDists(pqExplode(probes, idCol, vecCol, m), cent)
      .select(col("id").as("probe_id"), col("s").as("__ps"),
        col("c").as("__pc"), col("d"))

  /** ADC scoring: each corpus code row picks up its assigned centroid's
    * probe subdistance, summed per (probe, id) — corpus vectors never
    * rejoin after encoding; m BIGINTs per row through the aggregation.
    * The caller decides the probe-side join hint (broadcast for the
    * one-shot small-probe contract, size-gated for the persisted index). */
  private[ext] def pqAdcTopK(codes: DataFrame, probeSub: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("neighbor_id"))
    codes
      .join(probeSub,
        col("s") === col("__ps") && col("code") === col("__pc") &&
          col("id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("id"))
      .agg(sum(col("d")).as("dist"))
      .withColumnRenamed("id", "neighbor_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("dist"))
  }

  /** IVF-PQ with residual encoding + ADC — the FAISS `IVFADC` shape, the
    * standard billion-scale serving index: coarse-quantize each vector to
    * its IVF cell, PQ-encode the RESIDUAL (vector − cell centroid), and
    * at query time ADC-score probe residuals against the codes of the
    * probed cells only. Residual encoding is what makes PQ codebooks
    * sharable across cells: residuals are centered near zero regardless
    * of which cell a vector landed in, so one m×codebookSize codebook
    * covers the whole corpus where raw-vector PQ would need per-cell
    * books or lose precision to cell offsets.
    *
    * Plan shape at 100 TB: the coarse codebook and PQ codebook are both
    * KB-sized broadcasts; the build pays ONE shuffle join re-attaching
    * cell assignments to vectors (the residual computation — same cost
    * class as `IvfIndex.add`); query-side traffic is codes (m BIGINTs per
    * row) joined against a broadcast probe-residual ADC table keyed by
    * (list_id, s, c), so only probed cells' codes are touched and no
    * embedding moves after encoding. Residual arithmetic runs in DOUBLE
    * (float subtraction would round differently per engine); distances
    * are the usual floor(…·1e12) BIGINT sums — bit-identical anywhere.
    * Ties: dist asc, then neighbor id asc. */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 8, nProbe: Int = 3,
      m: Int = 4, codebookSize: Int = 16,
      iters: Int = 0)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(nLists > 0 && nProbe > 0 && m > 0 && codebookSize > 0 && iters >= 0,
      "nLists, nProbe, m, codebookSize must be positive, iters non-negative")
    val coarse = ivfCentroids(corpus, idCol, vecCol, nLists)
    // the one corpus-wide shuffle: cell assignment rejoins its vector so
    // the residual can be taken; materialized because three consumers
    // (PQ sample, encode, code→cell join) would otherwise re-run it
    val residuals = Parallelism.materialize(
      ivfResiduals(corpus, idCol, vecCol, coarse))
    val exCorpus0 = pqExplode(residuals, "id", "rvec", m)
      .withColumn("micro", floor(col("x") * lit(1e6)).cast("long"))
    // materialized only when Lloyd training will consume it twice per
    // iteration (same policy as pqTopK)
    val exCorpus =
      if (iters > 0) exCorpus0.transform(Parallelism.materialize(_)) else exCorpus0
    val cent = pqTrainCentroids(residuals, exCorpus, "id", "rvec", m,
      codebookSize, iters)
    val codes = pqAssign(exCorpus, cent)
      .join(residuals.select(col("id"), col("list_id")), Seq("id"))
    // size-gated like IvfPqIndex.query: the probe ADC table is
    // nProbe×m×codebookSize rows PER PROBE, so a bulk probe batch can
    // exceed the broadcast limit — degrade to a shuffle join instead of
    // OOMing the driver
    val probeSub = Parallelism.maybeBroadcast(
      ivfPqProbeSub(probes, idCol, vecCol, m, coarse, cent, nProbe),
      settings.probeBroadcastThresholdBytes)
    ivfPqAdcTopK(codes, probeSub, k)
  }

  /** (id, list_id, rvec) residual frame: each vector's IVF cell plus its
    * DOUBLE-precision residual against that cell's centroid (shared by
    * [[ivfPqTopK]] and [[IvfPqIndex]]). One shuffle join rejoins the
    * assignment to its vector; the coarse codebook broadcasts. */
  private[ext] def ivfResiduals(df: DataFrame, idCol: String, vecCol: String,
      coarse: DataFrame): DataFrame = {
    val coarseB = broadcast(
      coarse.select(col("list_id"), col("cvec").cast("array<double>").as("__cv")))
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v"))
      .join(ivfAssign(df, idCol, vecCol, coarse), Seq("id"))
      .join(coarseB, Seq("list_id"))
      .select(col("id"), col("list_id"),
        zip_with(col("__v"), col("__cv"), (x, c) => x - c).as("rvec"))
  }

  /** Probe-side IVFADC table: each probe's residual is taken PER PROBED
    * CELL (probe − that cell's centroid), sub-distanced against the
    * residual codebook — (probe_id, __pl, __ps, __pc, d), nProbe × m ×
    * codebookSize rows per probe. The caller picks the broadcast hint. */
  private[ext] def ivfPqProbeSub(probes: DataFrame, idCol: String,
      vecCol: String, m: Int, coarse: DataFrame, cent: DataFrame,
      nProbe: Int): DataFrame = {
    val coarseB = broadcast(
      coarse.select(col("list_id"), col("cvec").cast("array<double>").as("__cv")))
    val probeLists = ivfAssign(probes, idCol, vecCol, coarse, topN = nProbe)
      .select(col("id").as("probe_id"), col("list_id"))
    val probeRes = probes
      .select(col(idCol).as("probe_id"), col(vecCol).cast("array<double>").as("__pv"))
      .join(probeLists, Seq("probe_id"))
      .join(coarseB, Seq("list_id"))
      .select(struct(col("probe_id"), col("list_id")).as("__pid"),
        zip_with(col("__pv"), col("__cv"), (x, c) => x - c).as("prvec"))
    pqSubDists(pqExplode(probeRes, "__pid", "prvec", m), cent)
      .select(col("id.probe_id").as("probe_id"), col("id.list_id").as("__pl"),
        col("s").as("__ps"), col("c").as("__pc"), col("d"))
  }

  /** IVFADC scoring: codes (id, list_id, s, code) join the probe table on
    * (cell, subspace, codeword) — a corpus row scores only when its OWN
    * cell is among the probe's probed cells, so non-probed lists
    * contribute nothing (and in [[IvfPqIndex]] are never even scanned). */
  private[ext] def ivfPqAdcTopK(codes: DataFrame, probeSub: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("dist"), col("neighbor_id"))
    codes
      .join(probeSub,
        col("list_id") === col("__pl") && col("s") === col("__ps") &&
          col("code") === col("__pc") && col("id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("id"))
      .agg(sum(col("d")).as("dist"))
      .withColumnRenamed("id", "neighbor_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("dist"))
  }

  /** Hard-negative mining for contrastive training: for each probe, the
    * `k` most-similar corpus rows carrying a DIFFERENT label — maximally
    * confusable negatives, the pairs that actually move an embedding
    * model (random negatives are trivially separable). Deterministic
    * quantized cosine, ties to the smallest id; probes broadcast (swap in
    * ANN candidates for corpus-scale probe sets, as with
    * [[knnClassify]]). */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
      col(labelCol).as("__plabel"), quantizedDot(col(vecCol), col(vecCol)).as("__pq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"),
      col(labelCol).as("neighbor_label"),
      quantizedDot(col(vecCol), col(vecCol)).as("__nq"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    // NULL-SAFE label inequality: `=!=` is null for a null label on either
    // side, which silently drops every candidate of a weakly-labeled probe
    // (no negatives at all, no error). With <=> a null-label probe still
    // mines negatives from every labeled row, and two null labels count as
    // the SAME label (not a negative pair) — the conservative choice.
    c.join(broadcast(p),
        col("neighbor_id") =!= col("probe_id") &&
          !(col("neighbor_label") <=> col("__plabel")))
      .withColumn("sim", quantizedDot(col("__pv"), col("__nv")).cast("double") /
        sqrt(col("__pq").cast("double") * col("__nq").cast("double")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("neighbor_label"),
        col("rnk"), col("sim"))
  }

  /** kNN majority-vote classification: label each probe with the most
    * common label among its `k` nearest corpus rows (deterministic
    * quantized cosine; ties break to the smallest label). The auto-
    * labeling/weak-supervision primitive of a training-data pipeline —
    * propagate curated labels onto an unlabeled corpus.
    *
    * Candidate generation is pluggable: this wraps [[bruteForceTopK]]
    * (probes broadcast — right when the unlabeled batch is small); swap
    * in [[annTopK]]/[[ivfTopK]] neighbors for corpus-scale probe sets
    * and feed them to the same vote. */
  def knnClassify(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    // NULL-labeled rows can't vote — and Spark sorts NULL FIRST on the
    // tie-break, so a null group would win ties and "classify" probes as
    // NULL. They're excluded from neighbor SELECTION (not just the vote),
    // so every probe still gets k real votes.
    val labeled = corpus.filter(col(labelCol).isNotNull)
    val nn = bruteForceTopK(labeled, probes, idCol, vecCol, k, deterministic = true)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("votes").desc, col(labelCol))
    nn.join(labeled.select(col(idCol).as("neighbor_id"), col(labelCol)), "neighbor_id")
      .groupBy(col("probe_id"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("probe_id"), col(labelCol).as("pred_label"), col("votes"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`: multi-table
    * LSH candidate generation (ids only through the shuffle), then exact
    * cosine on re-attached vectors. Same scale shape as `annTopK`. */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nTables: Int = 8,
      bitsPerTable: Int = 4,
      portable: Boolean = false)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // materialize (see Dedup.minhashCandidatePairs): the self-join would
    // evaluate the bucket pipeline twice
    val banded = lshBucketRows(df, idCol, vecCol, nTables, bitsPerTable, portable).transform(Parallelism.materialize(_))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // norms attached per vector (once), not per candidate pair
    val vn = v.withColumn("sq", selfDot(col("vec"), portable))
    pairs
      .join(vn.select(col("id").as("id_a"), col("vec").as("vec_a"), col("sq").as("sq_a")),
        Seq("id_a"))
      .join(vn.select(col("id").as("id_b"), col("vec").as("vec_b"), col("sq").as("sq_b")),
        Seq("id_b"))
      .withColumn("cos",
        pairSim(col("vec_a"), col("sq_a"), col("vec_b"), col("sq_b"), portable))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  // --------------------------------------------- ANN recall evaluation

  /** Recall@k of an ANN result against exact ground truth — the eval
    * harness every production ANN deployment runs before trusting an
    * index. Both inputs are (probe_id, neighbor_id, rnk) top-k frames
    * (e.g. [[annTopK]] vs [[bruteForceTopK]]); the output is per-probe
    * hit counts and exact-integer recall.
    *
    * Scale: one hash join on (probe_id, neighbor_id) between two
    * probes×k-sized frames + one aggregation — independent of corpus
    * size; run it on a sampled probe set.
    */
  /** Exact re-rank of a candidate frame — stage two of the standard
    * two-stage retrieval path (coarse ANN/ADC candidates, then true
    * cosine on the shortlist): `candidates` is any `(probe_id,
    * neighbor_id)` frame (e.g. [[pqTopK]] at a widened k); the output is
    * the exact-similarity top-`k` per probe in the [[bruteForceTopK]]
    * schema. Cost is O(candidates) — probes×k' pairs, never corpus-sized:
    * the two vector attachments are broadcast-gated id joins and the
    * window runs per probe over its bounded shortlist. */
  def exactRerank(candidates: DataFrame, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, deterministic: Boolean = true)(
      implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      selfDot(col(vecCol), deterministic).as("probe_sq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
      selfDot(col(vecCol), deterministic).as("neighbor_sq"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id"))
    // The shortlist is often an unmaterialized index-query DAG (an IVF-PQ
    // cell-pruned ADC scan); without a barrier every downstream action on
    // the rerank result re-executes that whole upstream query — a
    // corpus-index rescan per consumer at serving scale. The shortlist is
    // probes×k' rows, so the barrier is cheap.
    Parallelism.materialize(
        candidates.select(col("probe_id"), col("neighbor_id")).distinct())
      .join(broadcast(p), Seq("probe_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("sim", pairSim(col("probe_vec"), col("probe_sq"),
        col("neighbor_vec"), col("neighbor_sq"), deterministic))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "sim")
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of several top-k
    * shortlists — the standard lexical⊕vector hybrid-search merge: each
    * list contributes `1/(k0 + rank)` per item, summed across lists, so
    * fusion needs NO score calibration between BM25 pico-units and cosine
    * similarities (rank is the only input — the reason RRF beats linear
    * score mixing across heterogeneous retrievers). Every input frame
    * must carry (probe_id, neighbor_id, rnk) — e.g. [[LexIndex.search]]
    * renamed, [[AnnIndex.query]] as-is. `k0 = 60` is the paper's
    * constant.
    *
    * Engine-portable: each reciprocal is frozen to micro units through
    * the d24 DECIMAL(28,6) discipline before the exact-BIGINT sum; ties
    * break on neighbor_id.
    *
    * Scale: inputs are probes×k-sized shortlists — the union + one
    * aggregation + per-probe window are all bounded by the shortlists,
    * never corpus-sized. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one shortlist")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val terms = lists.map(_.select(col("probe_id"), col("neighbor_id"),
        ((lit(1.0) / (lit(k0).cast("double") + col("rnk").cast("double")))
          .cast("decimal(28,6)") * lit(1000000)).cast("long").as("__rrf")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("rrf_micro").desc, col("neighbor_id"))
    terms
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(sum(col("__rrf")).as("rrf_micro"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("probe_id", "neighbor_id", "rnk", "rrf_micro")
  }

  def recallAtK(ann: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val truthK = truth.filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val annK = ann.filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val hits = truthK.join(annK, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("hits"))
    truthK.groupBy(col("probe_id")).agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        graft.operators.QueryDsl.ratio6(
          coalesce(col("hits"), lit(0L)), col("n_truth")).as("recall"))
  }

  // ------------------------------------ MMR diversified re-ranking

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily select `k` results per probe, trading query relevance
    * against redundancy with what is already selected —
    * `score = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — the standard
    * diversified-retrieval step after ANN candidate generation.
    *
    * Engine-portable: similarities are quantized cosine (exact integer
    * components), λ enters as ppm divided in double the same way on every
    * engine, and every argmax breaks ties on the candidate id.
    *
    * Scale: candidate PAIR similarities exist only within each probe's
    * bounded pool (poolSize² pairs per probe) and each of the k−1
    * selection steps is one window over pool rows — the rerank is
    * O(probes · poolSize²) regardless of corpus size. Pool generation is
    * pluggable; the default is [[bruteForceTopK]], swap in [[annTopK]] /
    * [[ivfTopK]] output at scale.
    *
    * Short pools: a probe whose candidate pool holds fewer than `k`
    * rows (corpus smaller than poolSize, or an ANN pool that came back
    * thin) emits one row per AVAILABLE candidate and stops — steps are
    * numbered 1..pool size, never padded. Downstream consumers must not
    * read fewer-than-k steps as data loss; count rows per probe_id when
    * exactly-k batches are required.
    */
  def mmrRerank(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 3,
      poolSize: Int = 10,
      lambdaPpm: Long = 700000L)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need poolSize >= k >= 1, got k=$k pool=$poolSize")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L, s"lambdaPpm out of range: $lambdaPpm")
    val lam = lit(lambdaPpm) / lit(1000000.0)
    val mu = lit(1000000L - lambdaPpm) / lit(1000000.0)
    val pool = bruteForceTopK(corpus, probes, idCol, vecCol, poolSize,
        deterministic = true)
      .select(col("probe_id"), col("neighbor_id"), col("sim"))
      .transform(Parallelism.materialize(_)) // feeds pair sims + every selection step
    // pairwise sims inside each probe's pool only (poolSize^2 bounded).
    // Norms are computed AFTER a semi-join down to the pool ids — probing
    // them on the raw corpus would rescan and re-norm every corpus row
    // once per pair-join side
    val vecs = corpus.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .join(pool.select(col("neighbor_id").as("__vid")).distinct(), Seq("__vid"), "left_semi")
      .select(col("__vid"), col("__v"),
        quantizedDot(col("__v"), col("__v")).as("__q"))
      .transform(Parallelism.materialize(_)) // <= probes*poolSize rows; joined twice below
    val pairs = pool.select(col("probe_id"), col("neighbor_id").as("__a"))
      .join(pool.select(col("probe_id"), col("neighbor_id").as("__b")), Seq("probe_id"))
      .filter(col("__a") =!= col("__b"))
      .join(vecs.select(col("__vid").as("__a"), col("__v").as("__va"), col("__q").as("__qa")), Seq("__a"))
      .join(vecs.select(col("__vid").as("__b"), col("__v").as("__vb"), col("__q").as("__qb")), Seq("__b"))
      .select(col("probe_id"), col("__a"), col("__b"),
        (quantizedDot(col("__va"), col("__vb")).cast("double") /
          sqrt(col("__qa").cast("double") * col("__qb").cast("double"))).as("__ps"))
      .transform(Parallelism.materialize(_))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    var selected = pool
      .withColumn("score", col("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("step"), col("score"))
    var all = selected
    var t = 2
    while (t <= k) {
      val cand = pool.join(all.select(col("probe_id"), col("neighbor_id")),
        Seq("probe_id", "neighbor_id"), "left_anti")
      val redundancy = cand
        .join(pairs.withColumnRenamed("__a", "neighbor_id"), Seq("probe_id", "neighbor_id"))
        .join(all.select(col("probe_id"), col("neighbor_id").as("__b")), Seq("probe_id", "__b"))
        .groupBy(col("probe_id"), col("neighbor_id"))
        .agg(max(col("__ps")).as("__mx"))
      selected = cand.join(redundancy, Seq("probe_id", "neighbor_id"))
        .withColumn("score", lam * col("sim") - mu * col("__mx"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("probe_id"), col("neighbor_id"), lit(t).as("step"), col("score"))
      all = Parallelism.rematerialize(all.unionByName(selected), all)
      t += 1
    }
    all
  }

  // --------------------------------------------- random projection (JL)

  /** Johnson–Lindenstrauss random projection: reduce `array<float>`
    * vectors to `outDims` dimensions with a deterministic ±1 sign matrix
    * derived from md5 — engine-portable (any engine rebuilds the matrix
    * from the same strings) and integer-exact (inputs quantize to micro
    * units; each projection is a BIGINT dot). A dense sign matrix
    * preserves pairwise distances within (1±ε) for outDims = O(ln n / ε²)
    * (Achlioptas 2003, database-friendly random projections).
    *
    * Scale: the matrix is built ONCE driver-side (outDims × inDims longs,
    * a few KiB) and ships as literals inside codegen'd array expressions —
    * per row the work is outDims integer dots; no shuffle, no join, no
    * per-row hashing. Use before ANN/clustering to cut vector bytes 4×+.
    */
  def randomProjection(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      inDims: Int,
      outDims: Int = 16): DataFrame = {
    require(outDims >= 1 && inDims >= 1, s"dims must be positive: $inDims -> $outDims")
    // fail loudly on ragged/mismatched vectors (the pqTopK contract): a
    // short vector would zip_with-pad with nulls and turn the whole
    // projection NULL; a long one would silently drop dimensions
    val vd = df.agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(vd.isNullAt(0) || (vd.getInt(0) == inDims && vd.getInt(1) == inDims),
      s"randomProjection: vector dims ${vd.get(0)}..${vd.get(1)} in '$vecCol' != inDims=$inDims")
    val signs: Array[Seq[Long]] = Array.tabulate(outDims) { j =>
      (0 until inDims).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp:$j:$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 1) == 0) 1L else -1L // first hex nibble even -> +1
      }
    }
    val micro = transform(col(vecCol), x => floor(x.cast("double") * lit(1e6)).cast("long"))
    val projCols = (0 until outDims).map { j =>
      aggregate(
        zip_with(col("__m"), typedLit(signs(j)), (m, s2) => m * s2),
        lit(0L), (acc, v) => acc + v).as(s"p$j")
    }
    df.withColumn("__m", micro)
      .select(col(idCol) +: projCols: _*)
  }

  // ----------------------------------------- centroid-distance outliers

  /** Embedding-space outlier detection for training-data curation: each
    * vector's exact integer L2 distance to its own group's (label's)
    * centroid, with the farthest `tailPpm` per group flagged. Vectors
    * quantize to micro units; centroid means round half-up in a
    * positive-SHIFTED space (Spark's integer `div` truncates toward zero
    * while DuckDB's floors — shifting every operand positive puts the two
    * in agreement); distances are exact integer sums. The per-group cutoff
    * is an ORDER STATISTIC taken on the (group, distance) histogram — no
    * global sort, no per-row rank window (the d21/d23 discipline), so the
    * only full-width shuffles are the per-dimension centroid aggregation
    * and the per-row distance aggregation, both hash-keyed.
    *
    * Overflow envelope: the shifted per-(label, dim) sum accumulates up to
    * ~3.4e7 per row into a Long, so the rounding formula (`2·sum + n`)
    * overflows past ~1.4e11 rows in ONE label — beyond that, split the
    * label space or widen the sums to DECIMAL(38,0) (the q47 pattern).
    */
  def centroidOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      tailPpm: Long = 50000L)(implicit settings: graft.conf.GraftSettings = graft.conf.GraftSettings.default): DataFrame = {
    require(tailPpm >= 0 && tailPpm <= 1000000L, s"tailPpm out of range: $tailPpm")
    val OFF = 1L << 24 // covers |component| <= 16.7 after micro quantization
    val ex = Parallelism.widen(df)
      .select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
        posexplode(transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6)).cast("long"))).as(Seq("__i", "__x")))
      .transform(Parallelism.materialize(_)) // feeds the centroid agg AND the distance join
    val cent = ex.groupBy(col("__lbl"), col("__i"))
      .agg(sum(col("__x") + lit(OFF)).as("__s"), count(lit(1)).as("__n"))
      .select(col("__lbl"), col("__i"),
        (call_function("div", col("__s") * lit(2L) + col("__n"), col("__n") * lit(2L))
          - lit(OFF)).as("__c"))
    val d2 = ex.join(cent, Seq("__lbl", "__i"))
      .groupBy(col("__id"), col("__lbl"))
      .agg(sum((col("__x") - col("__c")) * (col("__x") - col("__c"))).as("d2"))
    val hist = d2.groupBy(col("__lbl"), col("d2")).agg(count(lit(1)).as("__c"))
    val cum = hist.select(col("__lbl"), col("d2"), col("__c"),
      sum(col("__c")).over(Window.partitionBy(col("__lbl")).orderBy(col("d2"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("__cum"))
    val thresh = cum
      .withColumn("__k", call_function("div",
        sum(col("__c")).over(Window.partitionBy(col("__lbl")))
          * lit(1000000L - tailPpm), lit(1000000L)))
      .groupBy(col("__lbl"))
      .agg(min(when(col("__cum") >= col("__k"), col("d2"))).as("__t"))
    d2.join(thresh, Seq("__lbl"))
      .select(col("__id"), col("__lbl").as(labelCol), col("d2"),
        (col("d2") > col("__t")).as("is_outlier"))
      .withColumnRenamed("__id", idCol)
  }
}
