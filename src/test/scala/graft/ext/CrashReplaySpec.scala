package graft.ext

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.tables.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end crash-window contract for the persisted indexes: every index
  * records its ingest token BEFORE its store append(s), so a crash between
  * the two leaves a gap (token present, store rows missing). These specs
  * inject that exact crash via the armed failpoints, then replay the batch
  * through the REAL foreachBatch redelivery (the streaming checkpoint
  * re-plans the uncommitted batch with the same batchId), and assert the
  * final stores and outputs are identical to a never-crashed run — the
  * at-least-once guarantee the unit tests only approximated by calling
  * `add` twice by hand.
  */
class CrashReplaySpec extends SparkSpecBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-crash-").toString
  private implicit val settings: GraftSettings = GraftSettings.local(root)

  /** One checkpointed AvailableNow pass of `src` through `body`; returns
    * the failure if the injected crash fired. */
  private def ingestPass(src: String, ckpt: String, schema: StructType)(
      body: (DataFrame, Long) => Unit): Option[Throwable] = {
    val q = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) => body(batch, batchId); () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(); None }
    catch { case e: StreamingQueryException => Some(e) }
  }

  private def rowSet(t: GraftTable, cols: String*): Set[String] =
    if (!t.exists) Set.empty
    else t.read()
      .select(concat_ws("|", cols.map(c => col(c).cast("string")): _*))
      .as[String].collect().toSet

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private lazy val vecs =
    spark.read.parquet(s"${sf()}/embeddings.parquet").filter(col("vec_id") < 100)

  private lazy val docRows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "a completely different story about the spark optimizer and the shuffle"),
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (5L, "alpha beta gamma delta one two three four five six"))

  test("AnnIndex: crash between token and store appends replays to the clean state") {
    for (point <- Seq("after-token", "after-buckets")) {
      val base = s"$root/ann-$point"
      vecs.coalesce(1).write.parquet(s"$base/src")
      def run(idx: AnnIndex, ckpt: String): Option[Throwable] =
        ingestPass(s"$base/src", ckpt, vecSchema) { (b, id) =>
          idx.add(b, "vec_id", "embedding", ingestToken = Some(s"t-$id"))
        }
      val clean = new AnnIndex(spark, s"$base/clean", nTables = 4, bitsPerTable = 4)
      assert(run(clean, s"$base/ckpt-clean").isEmpty)
      val crashed = new AnnIndex(spark, s"$base/crashed", nTables = 4, bitsPerTable = 4)
      crashed.failpoints.arm(point)
      assert(run(crashed, s"$base/ckpt-crash").isDefined,
        s"the $point failpoint must kill the first attempt")
      // the crash window is real: token recorded, store append(s) missing
      assert(crashed.appliedTable.exists, "token must precede the appends")
      if (point == "after-token")
        assert(!crashed.bucketsTable.exists, "crash must precede the buckets append")
      assert(!crashed.vectorsTable.exists, "crash must precede the vectors append")
      // replay through the real redelivery (same batchId from the checkpoint)
      assert(run(crashed, s"$base/ckpt-crash").isEmpty, "replay must succeed")
      assert(rowSet(crashed.bucketsTable, "vec_id", "tbl", "bucket") ===
        rowSet(clean.bucketsTable, "vec_id", "tbl", "bucket"), s"$point: buckets differ")
      assert(rowSet(crashed.vectorsTable, "vec_id", "vec", "sq") ===
        rowSet(clean.vectorsTable, "vec_id", "vec", "sq"), s"$point: vectors differ")
      val probes = vecs.filter(col("vec_id") < 3)
      def q(i: AnnIndex) = i.query(probes, "vec_id", "embedding", k = 3)
        .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
      assert(q(crashed) === q(clean), s"$point: queries diverge after replay")
    }
  }

  test("NearDupIndex: crash windows replay to the clean stores AND the clean stats") {
    for (point <- Seq("after-token", "after-bands")) {
      val base = s"$root/ndi-$point"
      docRows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/src")
      def run(idx: NearDupIndex, out: GraftTable, ckpt: String): Option[Throwable] =
        ingestPass(s"$base/src", ckpt, docSchema) { (b, id) =>
          out.append(idx.detectAndAdd(b, "doc_id", "text", ingestToken = Some(s"t-$id"))
            .select("id_new", "id_matched"))
        }
      val clean = new NearDupIndex(spark, s"$base/clean")
      val cleanOut = GraftTable(spark, s"$base/clean-out")
      assert(run(clean, cleanOut, s"$base/ckpt-clean").isEmpty)
      val crashed = new NearDupIndex(spark, s"$base/crashed")
      val crashedOut = GraftTable(spark, s"$base/crashed-out")
      crashed.failpoints.arm(point)
      assert(run(crashed, crashedOut, s"$base/ckpt-crash").isDefined,
        s"the $point failpoint must kill the first attempt")
      assert(crashed.appliedTable.exists, "token must precede the appends")
      if (point == "after-token")
        assert(!crashed.bandsTable.exists, "crash must precede the bands append")
      assert(!crashed.sigsTable.exists, "crash must precede the sigs append")
      assert(run(crashed, crashedOut, s"$base/ckpt-crash").isEmpty, "replay must succeed")
      assert(rowSet(crashed.bandsTable, "doc_id", "band", "band_key") ===
        rowSet(clean.bandsTable, "doc_id", "band", "band_key"), s"$point: bands differ")
      assert(rowSet(crashed.sigsTable, "doc_id", "sig") ===
        rowSet(clean.sigsTable, "doc_id", "sig"), s"$point: sigs differ")
      // the replayed batch's RETURNED pair set equals the clean run's (the
      // pre-ingest snapshot probe stops it matching its own first attempt)
      assert(rowSet(crashedOut, "id_new", "id_matched") ===
        rowSet(cleanOut, "id_new", "id_matched"), s"$point: stats differ")
    }
  }

  test("BlockDedupIndex: token-append crash replays to the clean store AND stats") {
    val base = s"$root/blk"
    docRows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/src")
    def run(idx: BlockDedupIndex, out: GraftTable, ckpt: String): Option[Throwable] =
      ingestPass(s"$base/src", ckpt, docSchema) { (b, id) =>
        out.append(idx.detectAndAdd(b, "doc_id", "text", ingestToken = Some(s"t-$id"))
          .select("doc_id", "kept_blocks", "kept_tokens", "kept_md5"))
      }
    val clean = new BlockDedupIndex(spark, s"$base/clean", blockWords = 4)
    val cleanOut = GraftTable(spark, s"$base/clean-out")
    assert(run(clean, cleanOut, s"$base/ckpt-clean").isEmpty)
    val crashed = new BlockDedupIndex(spark, s"$base/crashed", blockWords = 4)
    val crashedOut = GraftTable(spark, s"$base/crashed-out")
    crashed.failpoints.arm("after-token")
    assert(run(crashed, crashedOut, s"$base/ckpt-crash").isDefined,
      "the failpoint must kill the first attempt")
    assert(crashed.appliedTable.exists, "token must precede the append")
    assert(!crashed.blocksTable.exists, "crash must precede the blocks append")
    assert(run(crashed, crashedOut, s"$base/ckpt-crash").isEmpty, "replay must succeed")
    assert(rowSet(crashed.blocksTable, "h") === rowSet(clean.blocksTable, "h"))
    assert(rowSet(crashedOut, "doc_id", "kept_blocks", "kept_tokens", "kept_md5") ===
      rowSet(cleanOut, "doc_id", "kept_blocks", "kept_tokens", "kept_md5"))
  }

  test("PqIndex: token-append crash replays to the clean codes store") {
    val base = s"$root/pq"
    vecs.coalesce(1).write.parquet(s"$base/src")
    def run(idx: PqIndex, ckpt: String): Option[Throwable] =
      ingestPass(s"$base/src", ckpt, vecSchema) { (b, id) =>
        idx.add(b, "vec_id", "embedding", ingestToken = Some(s"t-$id"))
      }
    val clean = new PqIndex(spark, s"$base/clean")
    clean.train(vecs, "vec_id", "embedding")
    assert(run(clean, s"$base/ckpt-clean").isEmpty)
    val crashed = new PqIndex(spark, s"$base/crashed")
    crashed.train(vecs, "vec_id", "embedding")
    crashed.failpoints.arm("after-token")
    assert(run(crashed, s"$base/ckpt-crash").isDefined,
      "the failpoint must kill the first attempt")
    assert(crashed.appliedTable.exists, "token must precede the append")
    assert(!crashed.codesTable.exists, "crash must precede the codes append")
    assert(run(crashed, s"$base/ckpt-crash").isEmpty, "replay must succeed")
    assert(rowSet(crashed.codesTable, "vec_id", "s", "code") ===
      rowSet(clean.codesTable, "vec_id", "s", "code"))
    val probes = vecs.filter(col("vec_id") < 3)
    def q(i: PqIndex) = i.query(probes, "vec_id", "embedding", k = 3)
      .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(q(crashed) === q(clean))
  }

  test("IvfPqIndex: token-append crash replays to the clean codes store") {
    val base = s"$root/ivfpq"
    vecs.coalesce(1).write.parquet(s"$base/src")
    def run(idx: IvfPqIndex, ckpt: String): Option[Throwable] =
      ingestPass(s"$base/src", ckpt, vecSchema) { (b, id) =>
        idx.add(b, "vec_id", "embedding", ingestToken = Some(s"t-$id"))
      }
    val clean = new IvfPqIndex(spark, s"$base/clean")
    clean.train(vecs, "vec_id", "embedding", nLists = 4)
    assert(run(clean, s"$base/ckpt-clean").isEmpty)
    val crashed = new IvfPqIndex(spark, s"$base/crashed")
    crashed.train(vecs, "vec_id", "embedding", nLists = 4)
    crashed.failpoints.arm("after-token")
    assert(run(crashed, s"$base/ckpt-crash").isDefined,
      "the failpoint must kill the first attempt")
    assert(crashed.appliedTable.exists, "token must precede the append")
    assert(!crashed.codesTable.exists, "crash must precede the codes append")
    assert(run(crashed, s"$base/ckpt-crash").isEmpty, "replay must succeed")
    assert(rowSet(crashed.codesTable, "vec_id", "list_id", "s", "code") ===
      rowSet(clean.codesTable, "vec_id", "list_id", "s", "code"))
    val probes = vecs.filter(col("vec_id") < 3)
    def q(i: IvfPqIndex) = i.query(probes, "vec_id", "embedding", k = 3)
      .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(q(crashed) === q(clean))
  }

  test("IvfIndex: token-append crash replays to the clean cells store") {
    val base = s"$root/ivf"
    vecs.coalesce(1).write.parquet(s"$base/src")
    def run(idx: IvfIndex, ckpt: String): Option[Throwable] =
      ingestPass(s"$base/src", ckpt, vecSchema) { (b, id) =>
        idx.add(b, "vec_id", "embedding", ingestToken = Some(s"t-$id"))
      }
    val clean = new IvfIndex(spark, s"$base/clean")
    clean.train(vecs, "vec_id", "embedding", nLists = 4)
    assert(run(clean, s"$base/ckpt-clean").isEmpty)
    val crashed = new IvfIndex(spark, s"$base/crashed")
    crashed.train(vecs, "vec_id", "embedding", nLists = 4)
    crashed.failpoints.arm("after-token")
    assert(run(crashed, s"$base/ckpt-crash").isDefined,
      "the failpoint must kill the first attempt")
    assert(crashed.appliedTable.exists, "token must precede the append")
    assert(!crashed.cellsTable.exists, "crash must precede the cells append")
    assert(run(crashed, s"$base/ckpt-crash").isEmpty, "replay must succeed")
    assert(rowSet(crashed.cellsTable, "vec_id", "list_id", "sq") ===
      rowSet(clean.cellsTable, "vec_id", "list_id", "sq"))
    val probes = vecs.filter(col("vec_id") < 3)
    def q(i: IvfIndex) = i.query(probes, "vec_id", "embedding", k = 3)
      .select("probe_id", "neighbor_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(q(crashed) === q(clean))
  }
}
