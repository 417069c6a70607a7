package graft.ext

import graft.SparkSpecBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap

/** 100x rehearsal for the persisted-index INGEST path — the ScaleSmokeSpec
  * discipline applied to the stateful operators: a two-batch [[AnnIndex]]
  * build over a 16-file embeddings table must (a) run its heavy hash/write
  * stages wide (a narrow link here serializes every crawl batch forever),
  * and (b) keep the stored side of the query's candidate join free of any
  * Exchange — the store streams through a broadcast join over a file-pruned
  * scan, which is the property that makes the index O(matched files) per
  * query instead of O(index) at 100 TB.
  */
class IndexScaleSpec extends SparkSpecBase {
  import spark.implicits._

  private val Copies = 16

  private final case class StageStat(numTasks: Int, runMs: Long)
  private val stages = TrieMap.empty[Int, StageStat]
  private val listener = new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      stages.put(si.stageId, StageStat(si.numTasks, si.taskMetrics.executorRunTime))
    }
  }

  override def withFixture(test: NoArgTest) = {
    spark.sparkContext.addSparkListener(listener)
    try super.withFixture(test)
    finally spark.sparkContext.removeSparkListener(listener)
  }

  /** 16-file replica of the sf0.01 embeddings table, vec_ids remapped to
    * stay globally unique (the AnnIndex id contract), materialized so the
    * remap is stable across every consumer. */
  private lazy val scaledEmb: DataFrame = {
    val out = Files.createTempDirectory("graft-idxscale-")
    val src = Paths.get(sf("sf0.01"), "embeddings.parquet")
    val dir = out.resolve("embeddings.parquet")
    Files.createDirectories(dir)
    (0 until Copies).foreach { i =>
      Files.copy(src, dir.resolve(f"part-$i%05d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    spark.read.parquet(dir.toString)
      .select(monotonically_increasing_id().as("vec_id"), col("embedding"))
      .localCheckpoint(true)
  }

  private def withScaleConfs[T](body: => T): T = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.files.openCostInBytes").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "32")
    conf.set("spark.sql.files.openCostInBytes", (128L * 1024 * 1024).toString)
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Run `body` to completion, then assert every heavy stage (>=500ms and
    * a third of the max — the ScaleSmokeSpec heuristic) ran wide. */
  private def assertWideAction(name: String, minWidth: Int)(body: => Unit): Unit = {
    org.apache.spark.graftbridge.ListenerBusBridge.drain(spark.sparkContext)
    stages.clear()
    body
    org.apache.spark.graftbridge.ListenerBusBridge.drain(spark.sparkContext)
    val all = stages.values.toSeq
    val maxRun = all.map(_.runMs).maxOption.getOrElse(0L)
    val heavy = all.filter(s => s.runMs >= math.max(500L, maxRun / 3))
    heavy.foreach { s =>
      assert(s.numTasks >= minWidth,
        s"$name: heavy stage ran ${s.numTasks}-wide (< $minWidth): " +
          s"runMs=${s.runMs} of max $maxRun — a 100x input would serialize here")
    }
    info(f"$name%-28s stages=${all.size}%2d heavy=${heavy.size}%2d")
  }

  test("two-batch AnnIndex ingest runs wide; query's stored side plans with zero Exchange") {
    withScaleConfs {
      val dir = Files.createTempDirectory("graft-idxscale-ann-").toString
      val idx = new AnnIndex(spark, s"file://$dir/idx", nTables = 4, bitsPerTable = 6)
      val minWidth = Copies / 2
      // incremental crawl shape: two adds, each hashing ONLY its batch —
      // the signature pipeline and the clustered write must both be wide
      assertWideAction("annindex.add batch 1", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", ingestToken = Some("b0"))
      }
      assertWideAction("annindex.add batch 2", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", ingestToken = Some("b1"))
      }
      assert(idx.indexedCount === scaledEmb.count())
      // the query itself completes against the two-batch store and its
      // heavy stages run wide (light pruned-scan stages sit under the
      // 500ms floor — they are the POINT of the pruning)
      val probes = scaledEmb.filter(col("vec_id") < 5)
      assertWideAction("annindex.query", minWidth) {
        assert(idx.query(probes, "vec_id", "embedding", k = 5).count() > 0)
      }
      // zero stored-side Exchange, asserted on the exact candidate-join
      // shape query() plans: pruned store scan ⨝ broadcast probe buckets
      val probeBuckets = Similarity.lshBucketRows(
          probes, "vec_id", "embedding", 4, 6, portable = false)
        .select(col("id").as("probe_id"), col("tbl"), col("bucket"))
        .localCheckpoint(true)
      val keys = probeBuckets
        .select((col("tbl").cast("long") * lit(1L << 32) + col("bucket").cast("long")).as("tb"))
        .distinct().as[Long].collect()
      // the clustered layout prunes: a probe's bucket set touches a strict
      // subset of the store's files
      val total = idx.bucketsTable.liveFiles().size
      val scanned = idx.bucketsTable.prunedFiles(col("tb").isin(keys.toSeq: _*)).size
      assert(scanned < total, s"IN-pruning must skip files: scanned $scanned of $total")
      val cand = idx.bucketsTable.readWhere(col("tb").isin(keys.toSeq: _*))
        .join(broadcast(probeBuckets), Seq("tbl", "bucket"))
      val p = cand.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"probe must broadcast:\n$p")
      // BroadcastExchange (the probe side) is the design; a partitioning
      // exchange anywhere means the stored side re-shuffled
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"stored side must not shuffle:\n$p")
      graft.lake.FsUtils.deletePath(spark, s"file://$dir")
    }
  }

  test("two-batch IvfIndex ingest runs wide; query's stored side plans with zero Exchange") {
    withScaleConfs {
      val dir = Files.createTempDirectory("graft-idxscale-ivf-").toString
      val idx = new IvfIndex(spark, s"file://$dir/idx")
      val minWidth = Copies / 2
      idx.train(scaledEmb, "vec_id", "embedding", nLists = 16)
      // incremental crawl shape: two adds, each assigning ONLY its batch —
      // the centroid-score pipeline and the clustered write must be wide
      assertWideAction("ivfindex.add batch 1", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", ingestToken = Some("b0"))
      }
      assertWideAction("ivfindex.add batch 2", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", ingestToken = Some("b1"))
      }
      assert(idx.indexedCount === scaledEmb.count())
      val probes = scaledEmb.filter(col("vec_id") < 5)
      assertWideAction("ivfindex.query", minWidth) {
        assert(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3).count() > 0)
      }
      // cell pruning bites on the clustered store...
      val cents = idx.centroidsTable.read().select("list_id", "cvec")
      val lists = Similarity.ivfAssign(probes, "vec_id", "embedding", cents, topN = 3)
        .select("list_id").distinct().as[Int].collect()
      val total = idx.cellsTable.liveFiles().size
      val scanned = idx.cellsTable.prunedFiles(col("list_id").isin(lists.toSeq: _*)).size
      assert(scanned < total, s"cell pruning must skip files: scanned $scanned of $total")
      // ...and the candidate join the query plans is broadcast-only on the
      // stored side: pruned scan ⨝ broadcast probe cell-memberships
      val probeLists = Similarity.ivfAssign(probes, "vec_id", "embedding", cents, topN = 3)
        .select(col("id").as("probe_id"), col("list_id")).localCheckpoint(true)
      val cand = idx.cellsTable.readWhere(col("list_id").isin(lists.toSeq: _*))
        .join(broadcast(probeLists), Seq("list_id"))
      val p = cand.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"probe must broadcast:\n$p")
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"stored side must not shuffle:\n$p")
      graft.lake.FsUtils.deletePath(spark, s"file://$dir")
    }
  }

  test("two-batch IvfPqIndex ingest runs wide; pruned ADC scan plans with zero Exchange") {
    withScaleConfs {
      val dir = Files.createTempDirectory("graft-idxscale-ivfpq-").toString
      val idx = new IvfPqIndex(spark, s"file://$dir/idx")
      val minWidth = Copies / 2
      idx.train(scaledEmb, "vec_id", "embedding", nLists = 16)
      // incremental crawl shape: two adds, each assigning + residual-
      // encoding ONLY its batch — the pipeline and clustered write wide
      assertWideAction("ivfpqindex.add batch 1", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", ingestToken = Some("b0"))
      }
      assertWideAction("ivfpqindex.add batch 2", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", ingestToken = Some("b1"))
      }
      assert(idx.indexedCount === scaledEmb.count())
      val probes = scaledEmb.filter(col("vec_id") < 5)
      assertWideAction("ivfpqindex.query", minWidth) {
        assert(idx.query(probes, "vec_id", "embedding", k = 5, nProbe = 3).count() > 0)
      }
      // cell pruning bites on the clustered CODES store (the layout raw
      // PQ cannot have)...
      val cb = idx.coarseTable.read().select("list_id", "cvec")
      val lists = Similarity.ivfAssign(probes, "vec_id", "embedding", cb, topN = 3)
        .select("list_id").distinct().as[Int].collect()
      val total = idx.codesTable.liveFiles().size
      val scanned = idx.codesTable.prunedFiles(col("list_id").isin(lists.toSeq: _*)).size
      assert(scanned < total, s"cell pruning must skip files: scanned $scanned of $total")
      // ...and the pruned ADC join is broadcast-only on the stored side
      val probeSub = Similarity.ivfPqProbeSub(probes, "vec_id", "embedding", 4,
        cb, idx.centroidsTable.read().select("c", "i", "s", "cx"), nProbe = 3)
        .localCheckpoint(true)
      val adcJoin = idx.codesTable.readWhere(col("list_id").isin(lists.toSeq: _*))
        .withColumnRenamed("vec_id", "id")
        .join(broadcast(probeSub),
          col("list_id") === col("__pl") && col("s") === col("__ps") &&
            col("code") === col("__pc") && col("id") =!= col("probe_id"))
      val p = adcJoin.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"ADC table must broadcast:\n$p")
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"stored side must not shuffle:\n$p")
      graft.lake.FsUtils.deletePath(spark, s"file://$dir")
    }
  }

  test("two-batch PqIndex ingest runs wide; ADC scan side plans with zero Exchange") {
    withScaleConfs {
      val dir = Files.createTempDirectory("graft-idxscale-pq-").toString
      val idx = new PqIndex(spark, s"file://$dir/idx")
      val minWidth = Copies / 2
      idx.train(scaledEmb, "vec_id", "embedding")
      // incremental crawl shape: two adds, each ENCODING only its batch —
      // the subdistance/argmin pipeline and the write must be wide
      assertWideAction("pqindex.add batch 1", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 0),
          "vec_id", "embedding", ingestToken = Some("b0"))
      }
      assertWideAction("pqindex.add batch 2", minWidth) {
        idx.add(scaledEmb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", ingestToken = Some("b1"))
      }
      assert(idx.indexedCount === scaledEmb.count())
      val probes = scaledEmb.filter(col("vec_id") < 5)
      assertWideAction("pqindex.query", minWidth) {
        assert(idx.query(probes, "vec_id", "embedding", k = 5).count() > 0)
      }
      // the codes store is consumed by ONE scan joined to the broadcast
      // probe-subdistance table — no partitioning Exchange below the ADC
      // aggregation's own shuffle of (probe, id) partials
      val probeSub = Similarity.pqProbeSubDists(probes, "vec_id", "embedding", 4,
        idx.centroidsTable.read().select("c", "i", "s", "cx")).localCheckpoint(true)
      val adcJoin = idx.codesTable.read()
        .select(col("vec_id").as("id"), col("s"), col("code"))
        .join(broadcast(probeSub),
          col("s") === col("__ps") && col("code") === col("__pc") &&
            col("id") =!= col("probe_id"))
      val p = adcJoin.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"probe subdistances must broadcast:\n$p")
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"stored side must not shuffle:\n$p")
      graft.lake.FsUtils.deletePath(spark, s"file://$dir")
    }
  }

  /** 16-file replica of the sf0.01 documents table, ids remapped to stay
    * globally unique (the LexIndex id contract). */
  private lazy val scaledDocs: DataFrame = {
    val out = Files.createTempDirectory("graft-idxscale-docs-")
    val src = Paths.get(sf("sf0.01"), "documents.parquet")
    val dir = out.resolve("documents.parquet")
    Files.createDirectories(dir)
    (0 until Copies).foreach { i =>
      Files.copy(src, dir.resolve(f"part-$i%05d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    spark.read.parquet(dir.toString)
      .select(monotonically_increasing_id().as("doc_id"), col("text"))
      .localCheckpoint(true)
  }

  test("two-batch LexIndex ingest runs wide; search's stored side plans with zero Exchange") {
    withScaleConfs {
      val dir = Files.createTempDirectory("graft-idxscale-lex-").toString
      val idx = new LexIndex(spark, s"file://$dir/idx")
      val minWidth = Copies / 2
      // incremental crawl shape: two adds, each tokenizing ONLY its batch —
      // the normalize/explode/tf pipeline and the clustered write must be wide
      assertWideAction("lexindex.add batch 1", minWidth) {
        idx.add(scaledDocs.filter(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "text", ingestToken = Some("b0"))
      }
      assertWideAction("lexindex.add batch 2", minWidth) {
        idx.add(scaledDocs.filter(pmod(col("doc_id"), lit(2)) === 1),
          "doc_id", "text", ingestToken = Some("b1"))
      }
      assert(idx.indexedCount === scaledDocs.count())
      // the query itself completes against the two-batch store (its pruned
      // scan stages sit under the heavy floor — they are the POINT)
      val q = scaledDocs.filter(col("doc_id") < 2).select(col("doc_id"), col("text"))
      assert(idx.search(q, "doc_id", "text", k = 5, excludeSelf = true).count() > 0)
      // zero stored-side Exchange on the exact candidate-join shape
      // search() plans: pruned postings scan ⨝ broadcast query terms
      val qTerms = q
        .select(col("doc_id").as("query_id"),
          explode(filter(split(TextAnalysis.normalize(col("text")), " "),
            t => length(t) > 0)).as("tok"))
        .distinct()
        .select(col("query_id"), xxhash64(col("tok")).as("th"))
        .localCheckpoint(true)
      val keys = qTerms.select("th").distinct().as[Long].collect()
      val total = idx.postingsTable.liveFiles().size
      val scanned = idx.postingsTable.prunedFiles(col("th").isin(keys.toSeq: _*)).size
      // a whole-document query over this degenerate 31-token vocabulary
      // touches most th ranges — the prune assertion lives in LexIndexSpec
      // on a short query; here the SHAPE is the claim
      val cand = idx.postingsTable.readWhere(col("th").isin(keys.toSeq: _*))
        .join(broadcast(qTerms), Seq("th"))
      val p = cand.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$p")
      assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning"),
        s"stored side must not shuffle:\n$p")
      info(f"lexindex files scanned $scanned of $total")
      graft.lake.FsUtils.deletePath(spark, s"file://$dir")
    }
  }
}
