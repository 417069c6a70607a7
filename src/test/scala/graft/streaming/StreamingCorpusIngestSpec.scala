package graft.streaming

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.ext.{NearDupIndex, TextAnalysis}
import graft.tables.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The streaming shape of the corpus-prep pipeline: documents arrive as a
  * file stream, each micro-batch is scrubbed + quality-filtered, checked
  * against the PERSISTED near-dup index (the corpus is hashed once, ever),
  * and only novel survivors land in the curated table. Checkpointed
  * run-to-drain, so a crashed ingest resumes without reprocessing.
  */
class StreamingCorpusIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-ingest-").toString
  private implicit val settings: GraftSettings = GraftSettings.local(root)
  private val srcDir = s"$root/incoming"
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private lazy val idx = new NearDupIndex(spark, s"$root/idx")
  private lazy val corpus = GraftTable(spark, s"$root/corpus")

  private def arrive(docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)

  private def ingestOnce(): Unit = {
    val q = spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val scrubbed = batch.withColumn("text", TextAnalysis.redactPii(col("text")))
        val quality = TextAnalysis.withTextMetrics(scrubbed, "text")
          .filter(col("quality_score") >= 0.3 && col("n_tokens") >= 5)
          .select("doc_id", "text")
          .localCheckpoint(true) // consumed by index join AND the append
        // batchId as ingest token: foreachBatch is at-least-once, and a
        // replayed batch must not self-match against its first attempt
        val dups = idx.detectAndAdd(quality, "doc_id", "text",
          ingestToken = Some(s"ndi-$batchId"))
          .select(col("id_new").as("doc_id")).distinct()
        val novel = quality.join(dups, Seq("doc_id"), "left_anti")
        if (!novel.isEmpty) corpus.append(novel)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def corpusIds: Set[Long] =
    corpus.read().select("doc_id").as[Long].collect().toSet

  test("batch 1: scrub + quality gate, uniques land in the curated table") {
    arrive(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today contact alice@example.com"),
      (2L, "a completely different story about the spark optimizer and the shuffle of the data today"),
      (3L, "9999 8888 7777 6666 5555 4444"))) // low quality -> dropped
    ingestOnce()
    assert(corpusIds === Set(1L, 2L))
    val t1 = corpus.read().filter(col("doc_id") === 1L).select("text").as[String].head()
    assert(t1.contains("<EMAIL>") && !t1.contains("@example.com"), s"scrub failed: $t1")
    assert(idx.indexedCount === 2)
  }

  test("batch 2: near-dups of the PERSISTED corpus are dropped without re-hashing it") {
    arrive(Seq(
      // near-dup of doc 1 (same text + one trailing word => jaccard ~0.93,
      // far above the 0.5 threshold so the 32-hash estimate can't flake)
      (4L, "the quick brown fox jumps over the lazy dog again and again today contact alice@example.com tonight"),
      (5L, "entirely novel prose describing the catalyst planner and the joins of the engine tonight")))
    ingestOnce()
    assert(corpusIds === Set(1L, 2L, 5L), s"got $corpusIds")
    // the index grows with every quality survivor, dup or not
    assert(idx.indexedCount === 4)
  }

  test("re-running with no new files is a checkpointed no-op") {
    val before = corpus.version
    ingestOnce()
    assert(corpus.version === before)
    assert(corpusIds === Set(1L, 2L, 5L))
  }

  test("streaming block dedup: later batches keep only never-seen blocks") {
    // separate source/index/checkpoint: this pipeline dedups at BLOCK
    // (paragraph) granularity via the persisted BlockDedupIndex
    val src2 = s"$root/incoming-blocks"
    val bIdx = new graft.ext.BlockDedupIndex(spark, s"$root/blkidx",
      blockWords = 4, portable = false)
    val kept = GraftTable(spark, s"$root/blk-kept")
    def ingestBlocks(): Unit = {
      val q = spark.readStream.schema(docSchema).parquet(src2)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // the batchId is the ingest token: foreachBatch is at-least-once,
          // and the token makes a replayed batch return its original stats
          // instead of seeing its own hashes as already-known
          val stats = bIdx.detectAndAdd(batch, "doc_id", "text",
            ingestToken = Some(s"blk-$batchId"))
          kept.append(stats.select("doc_id", "kept_blocks", "kept_tokens"))
          ()
        }
        .option("checkpointLocation", s"$root/blk-ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((10L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src2)
    ingestBlocks()
    // batch 2: doc 11 repeats doc 10's first block + adds a new one;
    // doc 12 is entirely a repeat of material now in the index
    Seq((11L, "alpha beta gamma delta one two three four"),
        (12L, "one two three four alpha beta gamma delta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src2)
    ingestBlocks()
    val rows = kept.read().collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(10L) === ((2L, 8L)), s"got ${rows(10L)}")
    assert(rows(11L) === ((1L, 4L)), s"got ${rows(11L)}")
    assert(rows(12L) === ((0L, 0L)), s"got ${rows(12L)}")
  }

  test("streaming WARC ingest: archives arrive as binary files, records land curated") {
    // crawl archives land in a directory; each micro-batch explodes its
    // records partition-locally and appends them to a curated table —
    // the ingestion front of the WET pipeline in streaming form
    val src = s"$root/incoming-warcs"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val recordsTable = GraftTable(spark, s"$root/warc-records")
    def ingestWarcs(): Unit = {
      val q = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val recs = graft.ext.Warc.recordsExploded(
            batch.select(col("path").as("file_id"), col("content")))
          if (!recs.isEmpty)
            recordsTable.append(recs.select("target_uri", "payload_len"))
          ()
        }
        .option("checkpointLocation", s"$root/warc-ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def writeArchive(name: String, docs: Seq[(String, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name"),
        graft.ext.Warc.write(docs.iterator.map { case (uri, text) =>
          graft.ext.Warc.WarcRecord("response", s"<urn:$uri>", uri, "text/plain",
            "2026-01-01T00:00:00Z", text.getBytes("UTF-8"))
        }))
    writeArchive("a.warc.gz", Seq(("http://a/1", "alpha beta"), ("http://a/2", "gamma")))
    ingestWarcs()
    assert(recordsTable.read().count() === 2)
    // a second archive arrives; the checkpoint resumes without re-ingesting
    writeArchive("b.warc.gz", Seq(("http://b/1", "delta epsilon zeta")))
    ingestWarcs()
    val rows = recordsTable.read().as[(String, Long)].collect().toSet
    assert(rows === Set(("http://a/1", 10L), ("http://a/2", 5L), ("http://b/1", 18L)))
  }

  test("streaming ANN ingest: embedding batches index incrementally, then serve") {
    // embeddings arrive as a file stream; each micro-batch hashes only
    // itself into the persisted AnnIndex (batchId as the idempotence
    // token), and the index serves queries between batches — the
    // hash-once/query-many crawl pattern in its streaming form
    val src = s"$root/incoming-vecs"
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val aIdx = new graft.ext.AnnIndex(spark, s"$root/annidx",
      nTables = 8, bitsPerTable = 4, portable = true)
    def ingestVecs(): Unit = {
      val q = spark.readStream.schema(vecSchema).parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          aIdx.add(batch, "vec_id", "embedding", ingestToken = Some(s"ann-$batchId"))
          ()
        }
        .option("checkpointLocation", s"$root/ann-ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    all.filter(col("vec_id") < 250).write.mode("append").parquet(src)
    ingestVecs()
    val afterFirst = aIdx.indexedCount
    all.filter(col("vec_id") >= 250).write.mode("append").parquet(src)
    ingestVecs()
    assert(aIdx.indexedCount === all.count())
    assert(afterFirst < aIdx.indexedCount)
    // the incrementally-built index answers exactly like the one-shot op
    val probes = all.filter(col("vec_id") < 3)
    val got = aIdx.query(probes, "vec_id", "embedding", k = 3)
      .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val want = graft.ext.Similarity.annTopK(all, probes, "vec_id", "embedding", 3,
        nTables = 8, bitsPerTable = 4, portable = true)
      .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(got === want)
  }
}
