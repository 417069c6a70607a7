package graft.streaming

import graft.conf.GraftSettings
import graft.ext.{AnnIndex, IvfIndex, IvfPqIndex, PqIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The assembled embedding-side ingestion pipeline — [[CorpusIngest]]'s
  * sibling for vectors: a checkpointed AvailableNow stream feeds each
  * enabled persisted vector index ([[AnnIndex]] always; [[IvfIndex]] /
  * [[PqIndex]] when configured) batch by batch, so an embedding corpus
  * becomes queryable incrementally without ever re-hashing / re-encoding
  * what's already indexed. Embeddings come from a model upstream; this
  * pipeline owns only the indexing side.
  *
  * Quantizer lifecycle: IVF/PQ need a trained codebook before their first
  * add, and retraining means rebuilding the index (their documented
  * contract), so the FIRST non-empty batch doubles as the training sample
  * — the production pattern of fitting the coarse quantizer on an early
  * sample and keeping it fixed. A crash between `train` and the first
  * `add` replays safely: `isTrained` gates the re-train, and every add
  * carries the batchId as its ingest token, so at-least-once redelivery
  * fills crash gaps without double-inserting (the [[graft.ext.Tombstoned]]
  * replay contract, crash-injected in EmbeddingIngestSpec).
  *
  * Scale shape per batch: each index's add is scan-plus-broadcast against
  * the batch (stored sides never shuffle — see the index scaladocs); the
  * batch is hashed/assigned/encoded once per index, and the only
  * corpus-sized frames touched are the index stores, scanned at most once
  * per batch each.
  */
final class EmbeddingIngest(
    spark: SparkSession,
    root: String,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    annTables: Int = 8,
    annBits: Int = 6,
    ivfLists: Int = 0,
    pqM: Int = 0,
    ivfPqM: Int = 0,
    ivfPqLists: Int = 0,
    dedupCosine: Double = 0.0)(
    implicit settings: GraftSettings = GraftSettings.default) {

  require(dedupCosine <= 1.0, s"dedupCosine must be <= 1.0, got $dedupCosine")

  val annIndex: AnnIndex =
    new AnnIndex(spark, s"$root/ann", nTables = annTables, bitsPerTable = annBits)
  /** IVF cells stage, enabled by `ivfLists > 0`. */
  val ivfIndex: Option[IvfIndex] =
    if (ivfLists > 0) Some(new IvfIndex(spark, s"$root/ivf")) else None
  /** PQ codes stage, enabled by `pqM > 0`. */
  val pqIndex: Option[PqIndex] =
    if (pqM > 0) Some(new PqIndex(spark, s"$root/pq", m = pqM)) else None
  /** Residual IVF-PQ stage (the billion-scale serving index), enabled by
    * `ivfPqM > 0`. Its coarse-cell count is `ivfPqLists`, defaulting to
    * `ivfLists` — but the two stages are INDEPENDENT: an IVF-PQ-only
    * pipeline (`ivfLists = 0, ivfPqLists > 0`) persists only compressed
    * codes, never a second full-vector copy. */
  private val ivfPqListsEff: Int = if (ivfPqLists > 0) ivfPqLists else ivfLists
  val ivfPqIndex: Option[IvfPqIndex] =
    if (ivfPqM > 0) {
      require(ivfPqListsEff > 0,
        "ivfPqM > 0 needs a coarse cell count: set ivfPqLists (or ivfLists) > 0")
      Some(new IvfPqIndex(spark, s"$root/ivfpq", m = ivfPqM))
    } else None

  /** One batch through every enabled index (also the foreachBatch body —
    * callable directly for non-streaming backfills; pass a unique `token`
    * per batch for at-least-once safety). Runs under a
    * [[graft.ext.Parallelism.scoped]] release scope: every barrier the
    * stages materialize is freed the moment the batch completes, so a
    * long-running ingest stream holds a bounded block footprint instead
    * of leaking each batch's checkpoints until a GC cycle. */
  def ingestBatch(batch: DataFrame, token: String): Unit =
    graft.ext.Parallelism.scoped { ingestBatchImpl(batch, token) }

  private def ingestBatchImpl(batch: DataFrame, token: String): Unit = {
    // one narrow projection, materialized once: every index consumes the
    // same (id, vec) frame, and the upstream source (a join against a
    // feature store, a decode) must not re-run per index
    val in = graft.ext.Parallelism.materialize(
      batch.select(col(idCol), col(vecCol)))
    if (in.isEmpty) return
    // persisted SemDedup at ingest (dedupCosine > 0): only vectors with no
    // near-twin already indexed — and none earlier in the batch — reach
    // the indexes, so an embedding corpus dedups INCREMENTALLY without
    // ever re-pairing what's stored. Intra-batch first (LSH-bucketed
    // pairs WITHIN the batch, higher id drops — deterministic, so replay
    // re-derives the same survivors), then one AnnIndex probe per
    // survivor against the store with the WHOLE batch's ids excluded from
    // the candidates: a redelivered batch therefore never matches its own
    // crashed-attempt rows — not at any rank — and the replayed novel set
    // equals the clean run's exactly (the index adds then fill any crash
    // gap under their tokens). Recall is the index's LSH recall (e04
    // semantics) — a miss means a rare surviving near-dup, never a lost
    // vector.
    val novel =
      if (dedupCosine <= 0) in
      else {
        val intraDrops = graft.ext.Similarity.cosineNearDupPairs(
            in, idCol, vecCol, dedupCosine, annTables, annBits, portable = true)
          .select(col("id_b").as(idCol)).distinct()
        val intra0 = in.join(intraDrops, Seq(idCol), "left_anti")
        val cross =
          if (!annIndex.hasStore) intra0
          else {
            // TWO consumers (the store probe and the anti-join) — barrier,
            // or the whole intra-batch LSH pairing pipeline executes twice
            val intra = graft.ext.Parallelism.materialize(intra0)
            val hits = annIndex.query(intra, idCol, vecCol, k = 1,
                excludeNeighbors = Some(in.select(col(idCol))))
              .filter(col("sim") >= dedupCosine)
              .select(col("probe_id").as(idCol)).distinct()
            intra.join(hits, Seq(idCol), "left_anti")
          }
        graft.ext.Parallelism.materialize(cross)
      }
    if (novel.isEmpty) return
    annIndex.add(novel, idCol, vecCol, ingestToken = Some(s"ann-$token"))
    ivfIndex.foreach { ivf =>
      // first non-empty batch trains the coarse quantizer; isTrained gates
      // the replay (train() refuses a second training by contract).
      // Trained and fed on the NOVEL set so every index holds the same ids
      // (and replay re-derives the identical set — dedup is deterministic)
      if (!ivf.isTrained) ivf.train(novel, idCol, vecCol, nLists = ivfLists)
      ivf.add(novel, idCol, vecCol, ingestToken = Some(s"ivf-$token"))
    }
    pqIndex.foreach { pq =>
      if (!pq.isTrained) pq.train(novel, idCol, vecCol)
      pq.add(novel, idCol, vecCol, ingestToken = Some(s"pq-$token"))
    }
    ivfPqIndex.foreach { ivfpq =>
      if (!ivfpq.isTrained) ivfpq.train(novel, idCol, vecCol, nLists = ivfPqListsEff)
      ivfpq.add(novel, idCol, vecCol, ingestToken = Some(s"ivfpq-$token"))
    }
  }

  /** Right-to-erasure / re-embed across every enabled index — the vector
    * side of [[CorpusIngest.eraseDocs]]: tombstone the ids in each index
    * so they vanish from queries immediately and cannot be resurrected by
    * a late or replayed batch; physical removal happens at each index's
    * `purge()` maintenance cadence (the shared [[graft.ext.Tombstoned]]
    * contract). Bounded maintenance sets only; run with no ingest in
    * flight. */
  def eraseVectors(ids: DataFrame): Unit = {
    require(ids.limit(100001).count() <= 100000,
      "eraseVectors: erasure is a bounded maintenance operation; " +
        "run larger sets in chunks")
    val idOnly = ids.select(col(idCol))
    annIndex.remove(idOnly, idCol)
    ivfIndex.foreach(_.remove(idOnly, idCol))
    pqIndex.foreach(_.remove(idOnly, idCol))
    ivfPqIndex.foreach(_.remove(idOnly, idCol))
  }

  /** Checkpointed run-to-drain over a parquet embedding directory: each
    * AvailableNow pass ingests only files the checkpoint has not seen. */
  def runOnce(srcDir: String, schema: StructType): Unit = {
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId.toString); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
