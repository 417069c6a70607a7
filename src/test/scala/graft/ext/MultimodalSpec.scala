package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
        Row("image/png", 100, 50, null, null)),
      Row(2L, "audio", Array[Byte](9, 8, 7, 6, 5, 4),
        Row("audio/wav", null, null, 16000, 2000L)),
      Row(3L, "video", (1 to 100).map(_.toByte).toArray,
        Row("video/mp4", 640, 480, null, 60000L)),
      Row(4L, "image", null, Row("image/png", 1, 1, null, null))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
  }

  test("withDecodedFeatures: partition-local decode, stable dim, null-safe") {
    val decoder = new Multimodal.StubDecoder(dim = 16)
    val out = Multimodal.withDecodedFeatures(mediaDf, decoder)
    val feats = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).size === 16)
    assert(feats(4L).isEmpty) // null payload -> empty features, no crash
    // deterministic: same bytes -> same features
    val again = Multimodal.withDecodedFeatures(mediaDf, decoder)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === again)
  }

  test("hashFeatures: codegen'd pseudo-features usable by vector ops") {
    val out = mediaDf.filter(col("content").isNotNull)
      .withColumn("features", Multimodal.hashFeatures(col("content"), 8))
    val collected = out.select("media_id", "features").collect()
    assert(collected.forall(_.getSeq[Float](1).size === 8))
    assert(collected.forall(_.getSeq[Float](1).forall(f => f >= 0f && f < 1f)))
    // downstream vector op composes directly
    val sims = out.as("a").join(out.as("b"), col("a.media_id") < col("b.media_id"))
      .select(Similarity.cosine(col("a.features"), col("b.features")).as("c"))
    assert(sims.count() === 3)
  }

  test("resizeStub rewrites metadata and bounds payload") {
    val out = Multimodal.resizeStub(mediaDf.filter(col("content").isNotNull), 4, 2)
    val metas = out.select(col("meta.width"), col("meta.height"), length(col("content"))).collect()
    assert(metas.forall(r => r.getInt(0) === 4 && r.getInt(1) === 2 && r.getInt(2) <= 8))
  }

  test("sampleFramesExploded yields ordered fixed-count frames") {
    val frames = Multimodal.sampleFramesExploded(
      mediaDf.filter(col("modality") === "video"), nFrames = 4)
    val collected = frames.orderBy("frame_idx").collect()
    assert(collected.length === 4)
    assert(collected.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3))
    assert(collected.forall(_.getAs[Array[Byte]](2).length === 25))
  }

  test("repartitionBySize keeps all rows and drops the helper column") {
    val out = Multimodal.repartitionBySize(mediaDf.filter(col("content").isNotNull), 4)
    assert(out.count() === 3)
    assert(!out.columns.contains("__size_bucket"))
  }
}
