package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

/** 100x-scale rehearsal: the partition-starvation / narrow-stage bug class,
  * asserted BEFORE the bench or a cluster finds it.
  *
  * Real clusters receive each table as MANY files; locally the sf dirs are
  * single-file (single row group => one unsplittable scan partition), which
  * is how two operators shipped with all their work serialized onto one
  * core (d03/d02, round 3). This spec drives both shapes:
  *
  *  - a 16-file replica of each FACT table (dims stay 1x so joins scale
  *    linearly, not quadratically): every stage that carries a meaningful
  *    share of the runtime must run at least half as wide as the file
  *    count — a structurally-narrow plan (coalesce(1), global window,
  *    single-partition exchange) fails here at any data size;
  *  - the same rows packed into ONE file: per-row-heavy text operators
  *    must still run at least defaultParallelism/2 wide, i.e. their
  *    explicit `Parallelism.widen`/repartition is present and effective.
  *
  * AQE is disabled and `openCostInBytes` raised so the assertions see the
  * STATIC plan width — at test scale AQE would legally coalesce everything
  * small, which is exactly the effect that does not generalize to 100 TB.
  * Shuffle volumes per query are recorded to the test log (info) so a
  * round-over-round diff shows which operator started moving more bytes.
  */
class ScaleSmokeSpec extends SparkSpecBase {

  private val Copies = 16
  private val factTables = Seq("documents", "embeddings", "lineitem", "events")
  private val dimTables = Seq("customer", "orders", "supplier", "part", "nation", "region")

  private final case class StageStat(numTasks: Int, runMs: Long, shuffleWrite: Long)
  private val stages = TrieMap.empty[Int, StageStat]
  private val listener = new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      stages.put(si.stageId, StageStat(
        si.numTasks,
        si.taskMetrics.executorRunTime,
        si.taskMetrics.shuffleWriteMetrics.bytesWritten))
    }
  }

  private lazy val scaledDir: String = {
    val out = Files.createTempDirectory("graft-scale-")
    factTables.foreach { tbl =>
      val src = Paths.get(sf("sf0.01"), s"$tbl.parquet")
      val dir = out.resolve(s"$tbl.parquet")
      Files.createDirectories(dir)
      (0 until Copies).foreach { i =>
        Files.copy(src, dir.resolve(f"part-$i%05d.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    dimTables.foreach { tbl =>
      val src = Paths.get(sf("sf0.01"), s"$tbl.parquet")
      if (Files.exists(src)) {
        val dir = out.resolve(s"$tbl.parquet")
        Files.createDirectories(dir)
        Files.copy(src, dir.resolve("part-00000.parquet"))
      }
    }
    out.toString
  }

  /** The 16-file documents table packed into ONE file — the adversarial
    * single-large-file shape that re-serializes un-widened per-row work. */
  private lazy val singleFileDir: String = {
    val out = Files.createTempDirectory("graft-scale1f-")
    val docs = spark.read.parquet(s"$scaledDir/documents.parquet")
    docs.coalesce(1).write.parquet(s"$out/documents.parquet")
    out.toString
  }

  private def withScaleConfs[T](body: => T): T = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.files.openCostInBytes").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "32")
    // one scan partition per file: emulates cluster-side parallelism that
    // local file-packing (4 MiB open cost vs tiny test files) would hide
    conf.set("spark.sql.files.openCostInBytes", (128L * 1024 * 1024).toString)
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Run `df` to completion, then assert every heavy stage ran wide.
    * `df` is BY-NAME and constructed after the stats reset: operators
    * with eager materialization in construction (localCheckpoint inside
    * qualityFiltered, band frames, signature pipelines) run their
    * heaviest stages AT construction, and an eagerly-evaluated argument
    * would finish before `clear()` — the exact stages this spec audits
    * would be wiped. The listener bus is drained before reading: stage
    * events are async and the final (often heaviest) stage's event may
    * land after the action returns. */
  private def assertWide(name: String, df: => DataFrame, minWidth: Int,
      dominantOnly: Boolean = false): Unit = {
    org.apache.spark.graftbridge.ListenerBusBridge.drain(spark.sparkContext)
    stages.clear()
    val rows = df.queryExecution.toRdd.count()
    assert(rows > 0, s"$name returned no rows at scale")
    org.apache.spark.graftbridge.ListenerBusBridge.drain(spark.sparkContext)
    val all = stages.values.toSeq
    val maxRun = all.map(_.runMs).maxOption.getOrElse(0L)
    // a stage matters when it carries a real share of the work AND at
    // least half a second of it: the old 100ms floor let a sub-second
    // AQE-coalesced/short exchange stage count as "heavy" under CI load
    // and fail the width assert 1-wide (the r7 q31 flake) — a genuinely
    // serialized heavy stage at this SF runs far above 500ms, so the
    // floor removes the noise class without weakening the bug class.
    // With `dominantOnly` just the top stage is audited: in the
    // single-file layout the 1-wide scan stage legitimately exists (one
    // unsplittable row group — a 100x file has many and splits), and
    // under CI load its read+exchange can creep over a time fraction;
    // the un-widened bug always makes the fused scan DOMINANT, which is
    // exactly what this still catches.
    val heavy =
      if (dominantOnly) all.filter(s => s.runMs == maxRun && s.runMs >= 500L)
      else all.filter(s => s.runMs >= math.max(500L, maxRun / 3))
    heavy.foreach { s =>
      assert(s.numTasks >= minWidth,
        s"$name: heavy stage ran ${s.numTasks}-wide (< $minWidth): " +
          s"runMs=${s.runMs} of max $maxRun — a 100x input would serialize here")
    }
    info(f"$name%-28s stages=${all.size}%2d heavy=${heavy.size}%2d " +
      f"shuffleWrite=${all.map(_.shuffleWrite).sum}%,d B")
  }

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  override def withFixture(test: NoArgTest) = {
    spark.sparkContext.addSparkListener(listener)
    try super.withFixture(test)
    finally spark.sparkContext.removeSparkListener(listener)
  }

  test("16-file facts: text, sketch, join, and vector queries all run wide") {
    withScaleConfs {
      val minWidth = Copies / 2
      assertWide("d03_langid", q("d03_langid", scaledDir), minWidth)
      assertWide("d11_quality_filter", q("d11_quality_filter", scaledDir), minWidth)
      assertWide("q29_approx_distinct", q("q29_approx_distinct", scaledDir), minWidth)
      assertWide("q31_skew_aware_join", q("q31_skew_aware_join", scaledDir), minWidth)
      assertWide("e03_ann_lsh", q("e03_ann_lsh", scaledDir), minWidth)
      assertWide("e04_cosine_neardup", q("e04_cosine_neardup", scaledDir), minWidth)
      assertWide("e07_kmeans", q("e07_kmeans", scaledDir), minWidth)
      assertWide("e08_semdedup", q("e08_semdedup", scaledDir), minWidth)
      assertWide("d24_tfidf_terms", q("d24_tfidf_terms", scaledDir), minWidth)
      assertWide("d27_block_dedup", q("d27_block_dedup", scaledDir), minWidth)
      assertWide("d28_bpe_pairs", q("d28_bpe_pairs", scaledDir), minWidth)
      assertWide("e14_centroid_outliers", q("e14_centroid_outliers", scaledDir), minWidth)
      assertWide("d33_bigram_nll", q("d33_bigram_nll", scaledDir), minWidth)
      assertWide("d35_span_removal", q("d35_span_removal", scaledDir), minWidth)
      // the COMPOSED crawl pipeline (WARC build → record explode → WET
      // text extraction → quality gate): the chain must stay wide end to
      // end — a single narrow link re-serializes everything downstream
      assertWide("d36_crawl_wet_pipeline", q("d36_crawl_wet_pipeline", scaledDir), minWidth)
      // crawl front end: URL canonicalization (regex/HOF-heavy projection)
      // and the skew-aware domain cap (vote + over-cap-only window)
      assertWide("d37_url_canonicalize", q("d37_url_canonicalize", scaledDir), minWidth)
      assertWide("d38_domain_cap", q("d38_domain_cap", scaledDir), minWidth)
    }
  }

  test("16-file facts: production minhash dedup runs wide end-to-end") {
    withScaleConfs {
      val docs = spark.read.parquet(s"$scaledDir/documents.parquet")
        // replicated ids collide across copies; dedup needs distinct ids
        .withColumn("doc_id", monotonically_increasing_id())
      val deduped = graft.ext.Dedup.minhashDedup(
        docs, "doc_id", "text", threshold = 0.5, numHashes = 32, bands = 8,
        portable = false)
      assertWide("d08x_minhash_dedup_prod", deduped, Copies / 2)
    }
  }

  test("single large file: per-row-heavy operators still widen explicitly") {
    withScaleConfs {
      // one input file => scan is 1-wide by construction; the HEAVY stages
      // (regex metrics, langid probes) must sit behind an explicit widen
      val minWidth = spark.sparkContext.defaultParallelism / 2
      assertWide("d02_text_metrics/1file", q("d02_text_metrics", singleFileDir), minWidth,
        dominantOnly = true)
      assertWide("d03_langid/1file", q("d03_langid", singleFileDir), minWidth,
        dominantOnly = true)
      assertWide("d13_pii_redaction/1file", q("d13_pii_redaction", singleFileDir), minWidth,
        dominantOnly = true)
      assertWide("d14_doc_chunks/1file", q("d14_doc_chunks", singleFileDir), minWidth,
        dominantOnly = true)
      assertWide("d20_repetition/1file", q("d20_repetition", singleFileDir), minWidth,
        dominantOnly = true)
      assertWide("d27_block_dedup/1file", q("d27_block_dedup", singleFileDir), minWidth,
        dominantOnly = true)
      // four regex passes per row (strip/decode/collapse) — must widen
      assertWide("d34_html_to_text/1file", q("d34_html_to_text", singleFileDir), minWidth,
        dominantOnly = true)
      // per-record gzip members — the WARC build must widen
      assertWide("d32_warc_ingest/1file", q("d32_warc_ingest", singleFileDir), minWidth,
        dominantOnly = true)
      // ~15 regex/HOF passes per row — URL canonicalization must widen
      assertWide("d37_url_canonicalize/1file", q("d37_url_canonicalize", singleFileDir), minWidth,
        dominantOnly = true)
    }
  }
}
