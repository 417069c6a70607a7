package graft.examples

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.operators.QueryDsl
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
    // project the doubled text ONCE and run langid against it — stacking
    // the un-hoisted form on the metrics pushes the generated method past
    // the 64 KB codegen limit (interpreted fallback, ~10x slower)
    TextAnalysis.withTextMetrics(docs.select(col("doc_id"), col("text"), col("lang")), "text")
      .withColumn("__x", TextAnalysis.doubledText(col("text")))
      .withColumn("lang_pred", TextAnalysis.langidIn(col("text"), col("__x")))
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

    println("== domain mixture to target lang weights (en 40%, rest 15% each):")
    TextAnalysis.mixtureSample(docs, "doc_id", "lang",
        Map("en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
          "fr" -> 150000L, "zh" -> 150000L))
      .groupBy("lang").count().orderBy("lang").show()

    println("== per-doc TF-IDF keywords (first 2 docs):")
    TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", topK = 3)
      .filter(col("doc_id") < 2).orderBy("doc_id", "rnk").show(truncate = false)

    println("== SemDeDup: embedding near-dups within k-means clusters:")
    Similarity.semDedup(emb, "vec_id", "embedding", k = 8, iters = 1, threshold = 0.3)
      .filter(col("is_dup")).orderBy("id").show(5)

    println("== kNN label propagation onto a held-out slice (vec_id % 10 = 0):")
    Similarity.knnClassify(
        corpus = emb.filter(col("vec_id") % 10 =!= 0),
        probes = emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", "label", k = 5)
      .orderBy("probe_id").show(5)

    println("== sessionized events (30 min gap):")
    val events = QueryDsl.t(spark, dir, "events") // normalizes ts across driver layouts
    StreamOps.sessionize(events, "ts", "user_id").orderBy("user_id", "session_start").show(5)

    println("== full corpus-prep pipeline: scrub -> quality -> derep -> dedup -> decontaminate -> sample -> chunk -> pack:")
    val prepared = prepareCorpus(docs, evalSet = docs.filter(col("doc_id") % 97 === 0))
    prepared.groupBy("lang").agg(
      countDistinct("doc_id").as("docs"),
      countDistinct("pack_id").as("packs"),
      count(lit(1)).as("chunks")).orderBy("lang").show()

    spark.stop()
  }

  /** The canonical corpus-prep pipeline, every stage an operator from this
    * library, in the order a production run applies them (cheap row-local
    * filters first, the one shuffle-bearing stage — dedup — on the
    * survivors only):
    *
    *  1. PII scrub (codegen regex, row-local)
    *  2. quality + language filter (row-local)
    *  3. repetition gate — Gopher-style dup-bigram share: template and
    *     boilerplate loops pass per-token quality but poison training
    *  4. near-dup removal, keeping each group's min id (one LSH pass)
    *  5. benchmark decontamination against `evalSet` (broadcast join)
    *  6. deterministic stratified sampling (scan+filter, no RNG state)
    *  7. context-window chunking (explode)
    *  8. sequence packing per language (one keyed window)
    *
    * Returns (doc_id, lang, chunk_idx, chunk, n_tokens, pack_id).
    */
  def prepareCorpus(docs: org.apache.spark.sql.DataFrame,
      evalSet: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val scrubbed = docs
      .withColumn("text", TextAnalysis.redactPii(col("text")))
    // annotate THEN checkpoint THEN filter: (a) filtering over the live
    // projection would inline the whole metric tree into the pushed-down
    // predicate (every regex twice per row — see qualityFiltered);
    // (b) the dedup self-join below consumes the frame twice;
    // (c) the barrier keeps the fused scrub+metrics+langid+shingle stage
    // under the 64 KB codegen method limit (else: interpreted fallback)
    val annotated = TextAnalysis.withTextMetrics(scrubbed, "text")
      .withColumn("__x", TextAnalysis.doubledText(col("text")))
      .withColumn("lang_pred", TextAnalysis.langidIn(col("text"), col("__x")))
      .drop("__x")
      .transform(graft.ext.Parallelism.checkpointTracked)
    val quality = annotated
      .filter(col("quality_score") >= 0.3 && col("n_tokens") >= 5)
    // repetition gate: docs whose bigram stream is mostly one loop
    // (nav bars, keyword stuffing) — null metrics (sub-2-token docs) pass
    val rep = TextAnalysis.repetitionMetrics(quality, "doc_id", "text")
      .select(col("doc_id"), col("dup_bigram_frac"))
    val unrepetitive = quality.join(rep, Seq("doc_id"), "left")
      .filter(col("dup_bigram_frac").isNull || col("dup_bigram_frac") <= 0.6)
      .drop("dup_bigram_frac")
    val deduped = Dedup.minhashDedup(unrepetitive, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 8)
      .filter(col("dup_group") === col("doc_id")) // keep group representative
      .drop("dup_group")
    // the eval set must be scrubbed IDENTICALLY: the corpus side was
    // redacted before shingling, so n-grams spanning a redacted span can
    // only match an eval doc whose same spans are redacted too
    val evalScrubbed = evalSet.withColumn("text", TextAnalysis.redactPii(col("text")))
    val contaminated = Dedup.ngramContamination(
        deduped, evalScrubbed, "doc_id", "text", shingleSize = 3, minOverlap = 5L)
      .select(col("corpus_id").as("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val sampled = clean.filter(
      pmod(TextAnalysis.portableHash60(col("doc_id").cast("string")), lit(1000)) <
        when(col("lang_pred") === "en", 800).otherwise(1000))
    val chunks = TextAnalysis.chunkTokens(sampled, "doc_id", "text",
      chunkSize = 64, stride = 48)
    val packed = chunks
      .join(sampled.select(col("doc_id"), col("lang_pred").as("lang")), "doc_id")
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("chunk")))
      .withColumn("pack_id", floor(
        coalesce(
          sum(col("n_tokens")).over(Window.partitionBy("lang")
            .orderBy("doc_id", "chunk_idx")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) / 2048.0).cast("int"))
    packed.select("doc_id", "lang", "chunk_idx", "chunk", "n_tokens", "pack_id")
  }
}
