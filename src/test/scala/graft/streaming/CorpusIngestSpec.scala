package graft.streaming

import graft.SparkSpecBase
import graft.conf.GraftSettings
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The assembled [[CorpusIngest]] pipeline, end to end: scrub → quality →
  * block dedup → near-dup dedup → curated append, through the real
  * checkpointed runner — including a crash injected INSIDE a stage and
  * replayed through the checkpoint, which must converge to the exact
  * never-crashed state (the whole-pipeline version of CrashReplaySpec).
  */
class CorpusIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def arrive(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)

  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today contact alice@example.com"),
    (2L, "a completely different story about the spark optimizer and the shuffle of the data today"),
    (3L, "9999 8888 7777 6666 5555 4444")) // low quality -> dropped
  private val batch2 = Seq(
    // near-dup of doc 1 (one trailing word -> jaccard far above threshold)
    (4L, "the quick brown fox jumps over the lazy dog again and again today contact alice@example.com tonight"),
    (5L, "entirely novel prose describing the catalyst planner and the joins of the engine tonight"))

  private def ids(p: CorpusIngest): Set[Long] =
    p.corpusTable.read().select("doc_id").as[Long].collect().toSet

  test("full pipeline: scrub, gate, dedup against the persisted corpus, resume") {
    val root = Files.createTempDirectory("graft-ci-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p")
    arrive(s"$root/in", batch1)
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L, 2L))
    val t1 = p.corpusTable.read().filter(col("doc_id") === 1)
      .select("text").as[String].head()
    assert(t1.contains("<EMAIL>") && !t1.contains("@example.com"), s"scrub failed: $t1")
    arrive(s"$root/in", batch2)
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L, 2L, 5L))
    assert(p.nearDupIndex.indexedCount === 4) // every quality survivor indexed
    // no new files: checkpointed no-op
    val v = p.corpusTable.version
    p.runOnce(s"$root/in", docSchema)
    assert(p.corpusTable.version === v)
  }

  test("model stage: a trained NB artifact gates the pipeline; redelivery stays idempotent") {
    val root = Files.createTempDirectory("graft-ci-nb-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    // train offline on a labeled fixture, persist the artifact
    val labeled = Seq(
      ("the quiet library holds many careful essays about science and history for readers", true),
      ("readers enjoy thoughtful writing about the catalyst planner and careful argument", true),
      ("buy cheap pills now click here free offer buy now cheap cheap pills offer", false),
      ("free free offer click buy pills cheap now click offer offer cheap buy", false))
      .toDF("text", "y")
    graft.ext.Classifier.saveModel(
      graft.ext.Classifier.nbTrain(labeled, "text", "y"), s"$root/model")
    val p = new CorpusIngest(spark, s"$root/p", nbModelPath = Some(s"$root/model"))
    arrive(s"$root/in", Seq(
      (1L, "a careful essay about history and science written for thoughtful readers today"),
      (2L, "click now buy cheap free pills offer click buy now cheap offer today please")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L), "the model stage must drop the spam doc and keep the prose doc")
    // redelivery through a fresh checkpoint replays the same keep set and
    // the curated anti-join keeps the append idempotent
    graft.lake.FsUtils.deletePath(spark, s"$root/p/ckpt")
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L))
  }

  test("block stage drops docs composed entirely of already-ingested blocks") {
    val root = Files.createTempDirectory("graft-ci-blk-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p", blockWords = 4)
    arrive(s"$root/in", Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L))
    arrive(s"$root/in", Seq(
      // pure recombination of doc 1's word-blocks: every block seen -> drop
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      // carries never-seen blocks -> kept (and not a near-dup)
      (3L, "totally fresh sentence about columnar shuffles and broadcast joins in spark engines")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(1L, 3L), s"got ${ids(p)}")
  }

  test("a crash inside a stage replays through the checkpoint to the clean state") {
    val root = Files.createTempDirectory("graft-ci-crash-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    def build(name: String): CorpusIngest = new CorpusIngest(spark, s"$root/$name")
    val clean = build("clean")
    val crashed = build("crashed")
    arrive(s"$root/in", batch1 ++ batch2)
    clean.runOnce(s"$root/in", docSchema)
    // kill the crashed twin between the near-dup index's token append and
    // its store appends — the worst window — then let the checkpoint
    // redeliver the batch
    crashed.nearDupIndex.failpoints.arm("after-token")
    intercept[Exception] { crashed.runOnce(s"$root/in", docSchema) }
    crashed.runOnce(s"$root/in", docSchema)
    assert(ids(crashed) === ids(clean))
    assert(crashed.nearDupIndex.indexedCount === clean.nearDupIndex.indexedCount)
    // and the pipelines keep agreeing on the NEXT batch
    arrive(s"$root/in", Seq(
      (6L, "entirely novel prose describing the catalyst planner and the joins of the engine this evening"),
      (7L, "some genuinely new writing about watermarks and stateful aggregation in streams")))
    clean.runOnce(s"$root/in", docSchema)
    crashed.runOnce(s"$root/in", docSchema)
    assert(ids(crashed) === ids(clean))
  }

  test("crawl front end: blocklist, canonical-URL dedup across batches, URL-less pass-through") {
    val root = Files.createTempDirectory("graft-ci-url-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val urlSchema = StructType(docSchema.fields :+ StructField("url", StringType))
    val p = new CorpusIngest(spark, s"$root/p",
      urlCol = Some("url"), blockedDomains = Seq("spam.example"))
    def arriveU(docs: Seq[(Long, String, String)]): Unit =
      docs.toDF("doc_id", "text", "url").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    val prose1 = "a completely different story about the spark optimizer and the shuffle of the data today"
    val prose2 = "entirely novel prose describing the catalyst planner and the joins of the engine tonight"
    val prose3 = "some genuinely new writing about watermarks and stateful aggregation in streams today"
    val prose4 = "fresh paragraph on partition pruning and adaptive execution in the planner tonight"
    arriveU(Seq(
      (1L, prose1, "HTTP://WWW.News.COM/a?utm_s=x"),
      (2L, prose2, "http://news.com/a"),             // same canonical URL as 1 -> dropped
      (3L, prose3, "http://ads.spam.example/z"),     // blocked host -> dropped
      (4L, prose4, "not a url")))                    // no URL identity -> passes
    p.runOnce(s"$root/in", urlSchema)
    assert(ids(p) === Set(1L, 4L), s"got ${ids(p)}")
    // across batches: the canonical URL seen in batch 1 stays seen
    // (default port + tracking param + www all collapse onto it)
    arriveU(Seq(
      (5L, "brand new essay on codegen stages and whole stage compilation in the engine", "http://www.news.com:80/a?utm_z=1"),
      (6L, "unrelated final piece about bloom filters and dynamic partition pruning today", "https://other.org/b")))
    p.runOnce(s"$root/in", urlSchema)
    assert(ids(p) === Set(1L, 4L, 6L), s"got ${ids(p)}")
    assert(p.urlIndex.get.indexedCount === 2) // http://news.com/a, https://other.org/b
    // a NULL url has no host: it must pass the blocklist (not be dropped
    // by three-valued !NULL) and carry no URL identity
    arriveU(Seq(
      (7L, "closing paragraph about vectorized readers and columnar batch execution", null)))
    p.runOnce(s"$root/in", urlSchema)
    assert(ids(p) === Set(1L, 4L, 6L, 7L), s"got ${ids(p)}")
    // front-end options without urlCol are misconfiguration, loudly
    intercept[IllegalArgumentException] {
      new CorpusIngest(spark, s"$root/bad1", blockedDomains = Seq("x.com"))
    }
    intercept[IllegalArgumentException] {
      new CorpusIngest(spark, s"$root/bad2", urlTrackOwners = true)
    }
  }

  test("WARC front door: a directory of crawl archives streams into the curated corpus") {
    val root = Files.createTempDirectory("graft-ci-warc-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p",
      urlCol = Some("url"), minQuality = 0.0, minTokens = 3)
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    def writeArchive(name: String, recs: Seq[(String, String)]): Unit = {
      val bytes = graft.ext.Warc.write(recs.iterator.map { case (uri, prose) =>
        graft.ext.Warc.WarcRecord("response", s"<urn:$uri>", uri, "text/html",
          "2026-01-01T00:00:00Z",
          s"<html><body><!-- nav --><p>$prose</p><script>var x=1;</script></body></html>"
            .getBytes("UTF-8"))
      }, gzipPerRecord = true)
      Files.write(java.nio.file.Paths.get(s"$root/in/$name"), bytes)
    }
    val prose1 = "a completely different story about the spark optimizer and the shuffle of the data today"
    val prose2 = "entirely novel prose describing the catalyst planner and the joins of the engine tonight"
    val prose3 = "some genuinely new writing about watermarks and stateful aggregation in streams today"
    writeArchive("a.warc.gz", Seq(
      ("http://www.one.com/x?utm_s=f", prose1),
      ("http://one.com/x", prose2))) // same canonical URL -> URL-deduped
    writeArchive("b.warc.gz", Seq(("https://two.org/y", prose3)))
    p.runOnceWarc(s"$root/in")
    val got1 = p.corpusTable.read().select("doc_id", "text", "url")
      .as[(Long, String, String)].collect().sortBy(_._1)
    // 3 records, minus the in-batch canonical-URL dup of file a's record 0
    assert(got1.length === 2, s"got ${got1.toSeq}")
    // ids are the deterministic (batch, file, record) bit-pack: batch 0,
    // sorted paths put a.warc.gz at file 0 and b.warc.gz at file 1
    assert(got1.map(_._1).toSeq === Seq(0L, 1L << 25), s"got ${got1.toSeq}")
    // HTML was stripped to prose and the crawl URL rode along
    assert(got1(0)._2 === prose1 && got1(0)._3 === "http://www.one.com/x?utm_s=f")
    assert(got1(1)._2 === prose3)
    // a later crawl: the canonical URL from batch 0 stays seen, new ones land
    writeArchive("c.warc.gz", Seq(
      ("http://www.one.com/x", prose2 + " extended with fresh material"),
      ("https://three.net/z",
        "fresh paragraph on partition pruning and adaptive execution in the planner tonight")))
    p.runOnceWarc(s"$root/in")
    val got2 = p.corpusTable.read().select("doc_id").as[Long].collect().toSet
    assert(got2 === Set(0L, 1L << 25, (1L << 45) + 1L), s"got $got2")
    // checkpointed redelivery with no new archives: a pure no-op
    val v = p.corpusTable.version
    p.runOnceWarc(s"$root/in")
    assert(p.corpusTable.version === v)
    // crash replay: the synthesized ids must come back BYTE-IDENTICAL on
    // redelivery (the whole design premise — the URL-index token and the
    // curated anti-join key on them). Crash a twin pipeline inside the
    // URL stage's worst window, let the checkpoint redeliver, and demand
    // the exact clean-run state.
    // both twins drain all three archives in ONE batch (unlike p's two),
    // so their ids must agree with each other, crash or no crash
    def twin(name: String): CorpusIngest = new CorpusIngest(spark, s"$root/$name",
      urlCol = Some("url"), minQuality = 0.0, minTokens = 3)
    val clean = twin("clean")
    clean.runOnceWarc(s"$root/in")
    val crashed = twin("crashed")
    crashed.urlIndex.get.failpoints.arm("after-token")
    intercept[Exception] { crashed.runOnceWarc(s"$root/in") }
    crashed.runOnceWarc(s"$root/in")
    val cr = crashed.corpusTable.read().select("doc_id", "url")
      .as[(Long, String)].collect().toSet
    val cl = clean.corpusTable.read().select("doc_id", "url")
      .as[(Long, String)].collect().toSet
    assert(cr === cl, s"crashed twin diverged: $cr vs $cl")
  }

  test("WARC id pack fails loudly (never wraps) at the 18-bit batch budget") {
    val root = Files.createTempDirectory("graft-ci-warcbound-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p")
    val fake = Seq(("x.warc", Array[Byte]())).toDF("path", "content")
    // last in-budget batch id passes the guard; the next one refuses
    p.warcBatchToDocs(fake, (1L << 18) - 1, htmlPayloads = false)
    val ex = intercept[IllegalArgumentException] {
      p.warcBatchToDocs(fake, 1L << 18, htmlPayloads = false)
    }
    assert(ex.getMessage.contains("18-bit"), ex.getMessage)
  }

  test("curated replay anti-join stat-prunes to the crash-window files, not the whole corpus") {
    val root = Files.createTempDirectory("graft-ci-prune-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p")
    p.ingestBatch(batch1.toDF("doc_id", "text"), "t0")
    p.ingestBatch(batch2.toDF("doc_id", "text"), "t1")
    val total = p.corpusTable.prunedFiles(lit(true)).size
    assert(total >= 2, s"expected one curated file per batch, got $total")
    // ids ascend across batches, so a later batch's replay probe
    // (id >= its min) must skip every earlier batch's file on stats
    assert(p.corpusTable.prunedFiles(col("doc_id") >= 6L).isEmpty,
      "min-id probe failed to stat-prune earlier batches' files")
    assert(p.corpusTable.prunedFiles(col("doc_id") >= 4L).size < total)
    // and the pruned anti-join still keeps redelivery a no-op
    val rows = p.corpusTable.read().count()
    p.ingestBatch(batch2.toDF("doc_id", "text"), "t1")
    assert(p.corpusTable.read().count() === rows, "redelivery duplicated corpus rows")
  }

  test("eraseDocs: corpus delete + near-dup release + URL release, recrawl re-admits") {
    val root = Files.createTempDirectory("graft-ci-erase-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val urlSchema = StructType(docSchema.fields :+ StructField("url", StringType))
    val p = new CorpusIngest(spark, s"$root/p",
      urlCol = Some("url"), urlTrackOwners = true)
    def arriveU(docs: Seq[(Long, String, String)]): Unit =
      docs.toDF("doc_id", "text", "url").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    val prose1 = "the quick brown fox jumps over the lazy dog again and again this very day"
    val prose2 = "a completely different story about the spark optimizer and the shuffle of the data today"
    arriveU(Seq(
      (1L, prose1, "https://news.com/a"),
      (2L, prose2, "https://news.com/b")))
    p.runOnce(s"$root/in", urlSchema)
    assert(ids(p) === Set(1L, 2L))
    // erase doc 1: gone from the corpus, its near-dup rows stop matching,
    // its URL claim is released
    p.eraseDocs(Seq(1L).toDF("doc_id"))
    assert(ids(p) === Set(2L), "erased doc must leave the curated corpus")
    assert(p.urlIndex.get.indexedCount === 1)
    // a recrawl of (near-identical text, same URL) under a NEW id is
    // re-admitted — neither the tombstoned minhash rows nor the released
    // URL claim may reject it; doc 2's claim still rejects its own URL
    arriveU(Seq(
      (3L, prose1 + " tonight", "https://news.com/a"),
      (4L, "some genuinely new writing about watermarks and stateful aggregation", "https://news.com/b")))
    p.runOnce(s"$root/in", urlSchema)
    assert(ids(p) === Set(2L, 3L), s"got ${ids(p)}")
    // the erase delete is a PRUNED rewrite: erasing doc 3 (batch-2 file)
    // must not rewrite batch-1's file — the range conjunct + file stats
    // keep it O(matching files)
    val before = p.corpusTable.prunedFiles(lit(true)).size
    p.eraseDocs(Seq(3L).toDF("doc_id"))
    assert(ids(p) === Set(2L))
    val h = p.corpusTable.history()
      .select("operation", "operationMetrics").head() // newest first
    assert(h.getString(0) === "delete")
    val rewritten = h.getMap[String, String](1)("numRewrittenFiles").toInt
    assert(rewritten < before,
      s"erase delete must prune files: rewrote $rewritten of $before live files")
    // erasure of a never-matched id set is a no-op, not an error
    p.eraseDocs(spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0))
    assert(ids(p) === Set(2L))
  }

  test("buildLexIndex: streamed BM25 mirrors the curated corpus, erasure included") {
    val root = Files.createTempDirectory("graft-ci-lex-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p", minQuality = 0.0, minTokens = 3,
      buildLexIndex = true)
    def arrive(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    arrive(Seq(
      (1L, "spark shuffles data between stages when keys move"),
      (2L, "the optimizer prunes columns and pushes filters"),
      (3L, "the optimizer prunes columns and pushes filters"))) // near-dup drops
    p.runOnce(s"$root/in", docSchema)
    arrive(Seq(
      (4L, "broadcast joins avoid shuffling the large fact side"),
      (5L, "stateful streams keep watermarks to bound their state")))
    p.runOnce(s"$root/in", docSchema)
    val q = Seq((100L, "shuffles the fact side")).toDF("doc_id", "text")
    def hits(idx: graft.ext.LexIndex) =
      idx.search(q, "doc_id", "text", k = 10)
        .as[(Long, Long, Int, Long)].collect().toSet
    // the streamed index must equal a one-shot index over the CURATED
    // corpus — same docs, same df/N/avgdl, same scores
    def oneShot(name: String): graft.ext.LexIndex = {
      val o = new graft.ext.LexIndex(spark, s"$root/$name")
      o.add(p.corpusTable.read().select(col("doc_id"), col("text")), "doc_id", "text")
      o
    }
    val streamed = hits(p.lexIndex.get)
    assert(streamed.nonEmpty)
    assert(streamed === hits(oneShot("one")), "streamed lex index diverged from corpus")
    // erasure drops the doc from the ranking AND the statistics
    p.eraseDocs(Seq(1L).toDF("doc_id"))
    assert(hits(p.lexIndex.get) === hits(oneShot("two")),
      "post-erasure lex index diverged from the erased corpus")
    assert(!hits(p.lexIndex.get).exists(_._2 == 1L))
  }

  test("eraseDocs(blockTrackClaims): sole block claims release, shared stay") {
    val root = Files.createTempDirectory("graft-ci-erase-blk-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p", minQuality = 0.0, minTokens = 3,
      blockWords = 4, blockTrackClaims = true)
    def arrive(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    // doc 10 claims blocks A+B; doc 11 claims A (shared) + D
    arrive(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta iota kappa lambda mu")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(10L, 11L))
    assert(p.blockIndex.get.indexedCount === 3)
    // erase doc 10: B's sole claim releases, shared A keeps doc 11's claim
    p.eraseDocs(Seq(10L).toDF("doc_id"))
    assert(ids(p) === Set(11L))
    assert(p.blockIndex.get.indexedCount === 2,
      "erasure must release the sole claim and keep the shared one")
    // recrawl: a doc made ENTIRELY of the released block re-admits; a doc
    // made entirely of the still-claimed block is a composite of retained
    // content and stays out
    arrive(Seq(
      (20L, "epsilon zeta eta theta"),  // B only — re-admits
      (21L, "alpha beta gamma delta"))) // A only — still suppressed
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(11L, 20L), s"got ${ids(p)}")
  }

  test("blockTrackClaims: a doc dropped by near-dup leaves NO ghost claim") {
    val root = Files.createTempDirectory("graft-ci-ghost-claims-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p", minQuality = 0.0, minTokens = 3,
      blockWords = 4, blockTrackClaims = true)
    // doc 10 lands; doc 11 is its near-dup (dropped AFTER the block stage)
    // sharing block A and bringing its own block D
    arrive(s"$root/in", Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta")))
    p.runOnce(s"$root/in", docSchema)
    arrive(s"$root/in", Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta nu")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(10L), "near-dup must have been dropped")
    // claims refcount CORPUS-RESIDENT docs only: erasing doc 10 releases
    // every one of its blocks — the dropped near-dup's visit left no
    // unreleasable +1 behind (the old over-count would keep suppressing)
    p.eraseDocs(Seq(10L).toDF("doc_id"))
    assert(p.blockIndex.get.indexedCount === 0,
      "a dropped doc's claims must not survive the erasure of the only resident claimant")
    arrive(s"$root/in", Seq((20L, "alpha beta gamma delta")))
    p.runOnce(s"$root/in", docSchema)
    assert(ids(p) === Set(20L), "released blocks must re-admit a recrawl")
  }

  test("a redelivered batch (crash AFTER the curated append) does not duplicate docs") {
    val root = Files.createTempDirectory("graft-ci-redeliver-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val p = new CorpusIngest(spark, s"$root/p")
    val batch = batch1.toDF("doc_id", "text")
    // the direct-backfill path with the same token twice models the worst
    // redelivery: the first attempt completed EVERYTHING except the
    // checkpoint commit — indexes replay to their original answers and
    // the curated append must be a no-op, not a double insert
    p.ingestBatch(batch, "t0")
    val rows = p.corpusTable.read().count()
    assert(ids(p) === Set(1L, 2L))
    p.ingestBatch(batch, "t0")
    assert(p.corpusTable.read().count() === rows, "redelivery duplicated corpus rows")
    assert(ids(p) === Set(1L, 2L))
  }
}
