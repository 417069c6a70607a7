package graft.streaming

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The assembled [[EmbeddingIngest]] pipeline, end to end: a checkpointed
  * AvailableNow stream feeding AnnIndex + IvfIndex + PqIndex — including
  * a crash injected INSIDE an index's token window and replayed through
  * the checkpoint, which must converge to the exact never-crashed state
  * (the vector-side twin of CorpusIngestSpec's crash test).
  */
class EmbeddingIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb =
    spark.read.parquet(s"${sf()}/embeddings.parquet").filter(col("vec_id") < 120)

  private def arrive(dir: String, pred: org.apache.spark.sql.Column): Unit =
    emb.filter(pred).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(dir)

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet

  private def probes: DataFrame = emb.filter(col("vec_id") < 3)

  test("streamed two-batch ingest answers every index like a one-shot build") {
    val root = Files.createTempDirectory("graft-ei-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new EmbeddingIngest(spark, s"$root/p", ivfLists = 4, pqM = 4, ivfPqM = 4)
    arrive(s"$root/in", col("vec_id") < 60)
    p.runOnce(s"$root/in", embSchema)
    arrive(s"$root/in", col("vec_id") >= 60)
    p.runOnce(s"$root/in", embSchema)
    assert(p.annIndex.indexedCount === emb.count())
    // the one-shot twin: same params, everything in one add — and for
    // IVF/PQ the same TRAINING SAMPLE (the codebook contract: batch 1)
    val twin = new EmbeddingIngest(spark, s"$root/twin", ivfLists = 4, pqM = 4, ivfPqM = 4)
    twin.ingestBatch(emb.filter(col("vec_id") < 60), "b0")
    twin.ingestBatch(emb.filter(col("vec_id") >= 60), "b1")
    assert(pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(twin.annIndex.query(probes, "vec_id", "embedding", k = 5)))
    assert(pairs(p.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)) ===
      pairs(twin.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
    assert(pairs(p.pqIndex.get.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(twin.pqIndex.get.query(probes, "vec_id", "embedding", k = 5)))
    assert(pairs(p.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)) ===
      pairs(twin.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
    // no new files: checkpointed no-op (no index gains rows)
    val n = p.annIndex.indexedCount
    p.runOnce(s"$root/in", embSchema)
    assert(p.annIndex.indexedCount === n)
  }

  test("a crash inside an index's token window replays through the checkpoint to the clean state") {
    val root = Files.createTempDirectory("graft-ei-crash-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    def build(name: String) =
      new EmbeddingIngest(spark, s"$root/$name", ivfLists = 4, pqM = 4, ivfPqM = 4)
    val clean = build("clean")
    val crashed = build("crashed")
    arrive(s"$root/in", col("vec_id") < 120)
    clean.runOnce(s"$root/in", embSchema)
    // kill the crashed twin between the ANN index's token append and its
    // store appends — the worst window — then let the checkpoint redeliver
    crashed.annIndex.failpoints.arm("after-token")
    intercept[Exception] { crashed.runOnce(s"$root/in", embSchema) }
    crashed.runOnce(s"$root/in", embSchema)
    assert(crashed.annIndex.indexedCount === clean.annIndex.indexedCount)
    assert(pairs(crashed.annIndex.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(clean.annIndex.query(probes, "vec_id", "embedding", k = 5)))
    // the downstream indexes never saw the crashed attempt twice either
    assert(pairs(crashed.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)) ===
      pairs(clean.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
    assert(pairs(crashed.pqIndex.get.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(clean.pqIndex.get.query(probes, "vec_id", "embedding", k = 5)))
    assert(pairs(crashed.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)) ===
      pairs(clean.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
  }

  test("eraseVectors tombstones every enabled index; purge reclaims and re-admission works") {
    val root = Files.createTempDirectory("graft-ei-erase-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new EmbeddingIngest(spark, s"$root/p", ivfLists = 4, pqM = 4, ivfPqM = 4)
    arrive(s"$root/in", col("vec_id") < 120)
    p.runOnce(s"$root/in", embSchema)
    val before = pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5))
    val victims = before.map(_._2).take(2)
    assert(victims.nonEmpty)
    p.eraseVectors(victims.toSeq.toDF("vec_id"))
    // every index answers as if the victims never existed (lower-ranked
    // live candidates fill in)
    for (q <- Seq(
        pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5)),
        pairs(p.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)),
        pairs(p.pqIndex.get.query(probes, "vec_id", "embedding", k = 5)),
        pairs(p.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2))))
      assert(q.forall(t => !victims.contains(t._2)), s"erased id still returned: $q")
    // a late batch re-delivering a victim cannot resurrect it pre-purge
    p.ingestBatch(emb.filter(col("vec_id").isin(victims.toSeq: _*)), "late")
    assert(pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5))
      .forall(t => !victims.contains(t._2)))
    // purge physically reclaims; a FRESH add then re-admits
    p.annIndex.purge(); p.ivfIndex.get.purge(); p.pqIndex.get.purge()
    p.ivfPqIndex.get.purge()
    p.ingestBatch(emb.filter(col("vec_id").isin(victims.toSeq: _*)), "readd")
    assert(pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5))
      .exists(t => victims.contains(t._2)),
      "purged then re-added ids must be queryable again")
  }

  test("ingest-time semantic dedup: near-twins drop intra-batch and cross-batch; replay converges") {
    val root = Files.createTempDirectory("graft-ei-dedup-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    // base vectors plus EXACT twins under new ids: cosine 1.0, so LSH
    // recall cannot miss them (same buckets by construction)
    val base = emb.filter(col("vec_id") < 40).select("vec_id", "embedding")
    def twinsOf(df: DataFrame, offset: Long): DataFrame =
      df.select((col("vec_id") + offset).as("vec_id"), col("embedding"))
    val p = new EmbeddingIngest(spark, s"$root/p", dedupCosine = 0.99)
    // batch 1: base + intra-batch twins -> only one of each pair indexed
    arrive2(s"$root/in", base.unionByName(twinsOf(base, 1000)))
    p.runOnce(s"$root/in", embSchema)
    assert(p.annIndex.indexedCount === 40,
      "intra-batch twins must collapse to one survivor per pair")
    // lower id must be the survivor
    val ids1 = p.annIndex.query(base.limit(0), "vec_id", "embedding", k = 1) // schema probe only
    assert(ids1.columns.toSeq === Seq("probe_id", "neighbor_id", "rnk", "sim"))
    // batch 2: cross-batch twins of already-indexed vectors + genuinely new
    val fresh = emb.filter(col("vec_id") >= 60 && col("vec_id") < 80)
      .select("vec_id", "embedding")
    arrive2(s"$root/in", twinsOf(base, 2000).unionByName(fresh))
    p.runOnce(s"$root/in", embSchema)
    assert(p.annIndex.indexedCount === 60,
      "cross-batch twins must be rejected by the index probe; fresh vectors admitted")
    // crash-replay twin: same two batches, crash inside the ANN token
    // window on batch 1, replay must converge to the same state
    val crashed = new EmbeddingIngest(spark, s"$root/c", dedupCosine = 0.99)
    arrive2(s"$root/cin", base.unionByName(twinsOf(base, 1000)))
    crashed.annIndex.failpoints.arm("after-token")
    intercept[Exception] { crashed.runOnce(s"$root/cin", embSchema) }
    crashed.runOnce(s"$root/cin", embSchema)
    arrive2(s"$root/cin", twinsOf(base, 2000).unionByName(fresh))
    crashed.runOnce(s"$root/cin", embSchema)
    assert(crashed.annIndex.indexedCount === p.annIndex.indexedCount)
    assert(pairs(crashed.annIndex.query(probes, "vec_id", "embedding", k = 5)) ===
      pairs(p.annIndex.query(probes, "vec_id", "embedding", k = 5)))
  }

  private def arrive2(dir: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("append").parquet(dir)

  test("IVF-PQ-only pipeline: compressed codes without a full-vector IvfIndex copy") {
    val root = Files.createTempDirectory("graft-ei-pqonly-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    // ivfLists = 0: no uncompressed IVF stage — the vector payload is
    // persisted once (AnnIndex) + compressed codes, never a third copy
    val p = new EmbeddingIngest(spark, s"$root/p", ivfPqM = 4, ivfPqLists = 4)
    assert(p.ivfIndex.isEmpty, "IVF-PQ-only must not force the IvfIndex stage")
    arrive(s"$root/in", col("vec_id") < 60)
    p.runOnce(s"$root/in", embSchema)
    arrive(s"$root/in", col("vec_id") >= 60)
    p.runOnce(s"$root/in", embSchema)
    // answers like a twin that trained/ingested the same batches
    val twin = new EmbeddingIngest(spark, s"$root/twin", ivfPqM = 4, ivfPqLists = 4)
    twin.ingestBatch(emb.filter(col("vec_id") < 60), "b0")
    twin.ingestBatch(emb.filter(col("vec_id") >= 60), "b1")
    val got = pairs(p.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2))
    assert(got.nonEmpty)
    assert(got === pairs(
      twin.ivfPqIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
  }

  test("a crash between IVF training and its first add replays without retraining") {
    val root = Files.createTempDirectory("graft-ei-train-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new EmbeddingIngest(spark, s"$root/p", ivfLists = 4)
    arrive(s"$root/in", col("vec_id") < 60)
    // crash inside the IVF add (after its token) — training already landed
    p.ivfIndex.get.failpoints.arm("after-token")
    intercept[Exception] { p.runOnce(s"$root/in", embSchema) }
    assert(p.ivfIndex.get.isTrained, "training must have committed before the crash")
    p.runOnce(s"$root/in", embSchema) // replay: no second train(), gap filled
    val twin = new EmbeddingIngest(spark, s"$root/twin", ivfLists = 4)
    twin.ingestBatch(emb.filter(col("vec_id") < 60), "b0")
    assert(pairs(p.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)) ===
      pairs(twin.ivfIndex.get.query(probes, "vec_id", "embedding", k = 5, nProbe = 2)))
  }
}
