package graft.examples

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.streaming.StreamOps
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Runnable tour of the training-data operator surface over the driver test
  * tables: text metrics, near-dup detection, ANN search, multimodal decode
  * plumbing, session windows.
  *
  * {{{ sbt "runMain graft.examples.TrainingDataDemo" }}}
  */
object TrainingDataDemo {

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-training-data-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    println("== text metrics + langid (first 5 docs):")
    TextAnalysis.withTextMetrics(docs.select(col("doc_id"), col("text"), col("lang")), "text")
      .withColumn("lang_pred", TextAnalysis.langid(col("text")))
      .select("doc_id", "lang", "lang_pred", "n_tokens", "alpha_ratio", "quality_score")
      .orderBy("doc_id").show(5, truncate = false)

    println("== minhash near-dup candidate pairs (est jaccard >= 0.5):")
    Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(desc("est_jaccard")).show(5)

    println("== ANN top-3 neighbors for probes 0-2 (multi-table LSH):")
    Similarity.annTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, nTables = 8, bitsPerTable = 4).orderBy("probe_id", "rnk").show()

    println("== multimodal: stub decode -> features -> pairwise cosine:")
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", Array[Byte](1, 2, 3, 4), Row("image/png", 2, 2, null, null)),
        Row(2L, "image", Array[Byte](1, 2, 3, 4), Row("image/png", 2, 2, null, null)),
        Row(3L, "audio", Array[Byte](9, 9, 9), Row("audio/wav", null, null, 16000, 5L))), 2),
      Multimodal.MediaSchema)
    val feats = Multimodal.withDecodedFeatures(media, new Multimodal.StubDecoder(8))
    feats.as("a").join(feats.as("b"), col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        round(Similarity.cosine(col("a.features"), col("b.features")), 4).as("cos"))
      .show()

    println("== sessionized events (30 min gap):")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
    val events = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    StreamOps.sessionize(events, "ts", "user_id").orderBy("user_id", "session_start").show(5)

    spark.stop()
  }
}
