package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** `readStream`/`writeStream format("graft")` — commit-log tailing with
  * Delta-source semantics: incremental micro-batches, rewrite refusal and
  * `ignoreChanges`, `startingVersion`, and the sink's batch-id replay
  * skip. */
class GraftStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-stream-").toString

  private def drain(src: String, dst: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft").options(extra).load(src)
    val q = reader.writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
  }

  test("graft-to-graft stream copies the log incrementally, exactly once") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    src.append(Seq((3L, "c")).toDF("id", "k"))

    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    val dst = GraftTable(spark, s"$root/dst")
    assert(dst.read().orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L))

    // incremental: only the NEW commit flows on the next drain
    src.append(Seq((4L, "d"), (5L, "e")).toDF("id", "k"))
    val v0 = dst.version
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    assert(dst.read().count() == 5)
    assert(dst.version == v0 + 1) // one commit for the one new batch
    // the sink stamped its (queryKey, batchId) transaction in the log
    val last = dst.commits().last.metrics
    assert(last.contains(GraftStreamSink.QueryKey) &&
      last.contains(GraftStreamSink.BatchKey))

    // nothing new: a further drain commits nothing
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    assert(dst.version == v0 + 1)
  }

  test("a fresh stream starts from the SNAPSHOT, so history rewrites don't matter") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    src.delete(col("id") === 1L) // rewrite BEFORE the stream exists
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    // the first batch is the live snapshot: the deleted row never flows
    assert(GraftTable(spark, s"$root/dst").read()
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // ...and the tail after it stays incremental
    src.append(Seq((3L, "c")).toDF("id", "k"))
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    assert(GraftTable(spark, s"$root/dst").read()
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("a rewrite commit in the TAILED range fails the stream unless ignoreChanges") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    src.delete(col("id") === 1L)

    // startingVersion forces log replay over the rewrite -> refusal
    val e = intercept[Exception](drain(s"$root/src", s"$root/d1", s"$root/c1",
      Map("startingVersion" -> "0")))
    assert(e.getMessage.contains("ignoreChanges") ||
      Option(e.getCause).exists(_.getMessage.contains("ignoreChanges")))

    drain(s"$root/src", s"$root/d2", s"$root/c2",
      Map("startingVersion" -> "0", "ignoreChanges" -> "true"))
    // the documented ignoreChanges hazard: the pre-rewrite files' rows
    // re-deliver (id 1 arrives from v1's file even though v2 deleted it,
    // and surviving rows may duplicate) — downstream dedups by key
    assert(GraftTable(spark, s"$root/d2").read()
      .select("id").as[Long].collect().toSeq.distinct.sorted == Seq(1L, 2L))

    // a rewrite AFTER the snapshot start refuses too (it is in the tail)
    drain(s"$root/src", s"$root/d3", s"$root/c3")
    src.delete(col("id") === 2L)
    val e2 = intercept[Exception](drain(s"$root/src", s"$root/d3", s"$root/c3"))
    assert(e2.getMessage.contains("ignoreChanges") ||
      Option(e2.getCause).exists(_.getMessage.contains("ignoreChanges")))
  }

  test("startingVersion replays from its version INCLUSIVE (Delta convention)") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a")).toDF("id", "k")) // v1 — before the start
    src.append(Seq((2L, "b")).toDF("id", "k"))    // v2 — the start itself
    drain(s"$root/src", s"$root/dst", s"$root/ckpt",
      Map("startingVersion" -> "2"))
    assert(GraftTable(spark, s"$root/dst").read()
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // inclusive: starting at 1 delivers v1's rows too
    drain(s"$root/src", s"$root/dst2", s"$root/ckpt2",
      Map("startingVersion" -> "1"))
    assert(GraftTable(spark, s"$root/dst2").read()
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("the sink skips a replayed batch id but not a new one") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    val sink = new GraftStreamSink(t, "q-1")
    val batch = Seq((1L, "a")).toDF("id", "k")
    sink.addBatch(0, batch)
    sink.addBatch(0, batch) // at-least-once redelivery: must no-op
    assert(t.read().count() == 1)
    sink.addBatch(1, batch)
    assert(t.read().count() == 2)
    // a different query's batch 0 is NOT a replay of ours
    new GraftStreamSink(t, "q-2").addBatch(0, batch)
    assert(t.read().count() == 3)
  }

  test("maxFilesPerTrigger drains a commit backlog in capped batches, same final content") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    // 10-commit backlog, one file per commit
    (1L to 10L).foreach(i => src.append(Seq((i, s"k$i")).toDF("id", "k").coalesce(1)))

    // fresh stream: the initial SNAPSHOT (10 files) drains 2 files/batch
    drain(s"$root/src", s"$root/dst", s"$root/ckpt",
      Map("maxFilesPerTrigger" -> "2"))
    val dst = GraftTable(spark, s"$root/dst")
    assert(dst.read().select("id").as[Long].collect().sorted.toSeq == (1L to 10L))
    assert(dst.version >= 5, s"expected >=5 capped batches, got ${dst.version} commits")

    // resumed stream over a 6-commit TAIL backlog: 2 commits/batch (the
    // commit is the atomic admission unit) -> 3 more sink commits
    (11L to 16L).foreach(i => src.append(Seq((i, s"k$i")).toDF("id", "k").coalesce(1)))
    val v0 = dst.version
    drain(s"$root/src", s"$root/dst", s"$root/ckpt",
      Map("maxFilesPerTrigger" -> "2"))
    assert(dst.read().select("id").as[Long].collect().sorted.toSeq == (1L to 16L))
    assert(dst.version - v0 >= 3, s"expected >=3 capped batches, got ${dst.version - v0}")

    // uncapped drain of the same source matches byte-for-byte
    drain(s"$root/src", s"$root/flat", s"$root/ckpt-flat")
    val flat = GraftTable(spark, s"$root/flat")
    assert(flat.read().orderBy("id").collect().toSeq ==
      dst.read().orderBy("id").collect().toSeq)
  }

  test("maxBytesPerTrigger admits at least one file per batch and still drains fully") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    (1L to 4L).foreach(i => src.append(Seq((i, s"k$i")).toDF("id", "k").coalesce(1)))
    // 1 byte per trigger: every parquet file is oversized, so each batch
    // carries exactly the one crossing file — 4 snapshot files, >=4 batches
    drain(s"$root/src", s"$root/dst", s"$root/ckpt",
      Map("maxBytesPerTrigger" -> "1"))
    val dst = GraftTable(spark, s"$root/dst")
    assert(dst.read().select("id").as[Long].collect().sorted.toSeq == (1L to 4L))
    assert(dst.version >= 4, s"expected >=4 byte-capped batches, got ${dst.version}")
  }

  test("a schema change committed mid-stream fails the query loudly; a restart picks it up") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a")).toDF("id", "k"))
    // one LIVE source instance (= one running query): schema pinned at v1
    val source = new GraftStreamSource(src, Map.empty)
    val off1 = source.latestOffset(null, ReadLimit.allAvailable())
    source.getBatch(None, GraftOffset.parse(off1)) // snapshot batch: fine
    // additive evolution lands WHILE the query runs
    src.append(Seq((2L, "b", 7)).toDF("id", "k", "extra"))
    val off2 = source.latestOffset(off1, ReadLimit.allAvailable())
    val e = intercept[IllegalStateException](
      source.getBatch(Some(GraftOffset.parse(off1)), GraftOffset.parse(off2)))
    assert(e.getMessage.contains("changed during the stream"))
    // a RESTART (fresh source / fresh drain) re-pins the widened schema
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    val dst = GraftTable(spark, s"$root/dst")
    assert(dst.read().columns.toSet == Set("id", "k", "extra"))
    assert(dst.read().count() == 2)
  }

  test("compaction is invisible to the stream") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite(Seq((1L, "a")).toDF("id", "k"))
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    (2L to 6L).foreach(i => src.append(Seq((i, s"k$i")).toDF("id", "k")))
    src.compactIfNeeded(maxFiles = 2) // dataChange=false rewrite
    drain(s"$root/src", s"$root/dst", s"$root/ckpt")
    assert(GraftTable(spark, s"$root/dst").read().count() == 6)
  }

  // ---- streaming CDF read (readChangeFeed) --------------------------------

  private def drainCdf(src: String, out: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").options(extra).load(src)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (q.exception.isDefined) throw q.exception.get
  }

  test("CDF stream: fresh tail delivers only post-start changes, rewrites included") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite((1L to 10L).map(i => (i, s"k$i")).toDF("id", "k")) // pre-start
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt") // positions at head
    // nothing delivered yet (Delta default: changes start after stream start)
    assert(!new java.io.File(s"$root/out").exists() ||
      spark.read.parquet(s"$root/out").isEmpty)
    src.delete(col("id") <= 3) // v2: a REWRITE — the CDF stream's bread
    src.append(Seq((11L, "k11")).toDF("id", "k")) // v3
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt")
    val got = spark.read.parquet(s"$root/out")
    assert(got.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
    assert(got.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet === Set(11L))
    assert(got.select("_commit_version").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("CDF stream: startingVersion replays history; caps bound each batch") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    (1L to 6L).foreach(i => src.append(Seq((i, s"k$i")).toDF("id", "k").coalesce(1)))
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt",
      Map("startingVersion" -> "1", "maxFilesPerTrigger" -> "2"))
    val got = spark.read.parquet(s"$root/out")
    assert(got.select("id").as[Long].collect().sorted.toSeq === (1L to 6L))
    assert(got.select("_change_type").distinct().as[String].collect().toSeq === Seq("insert"))
    // capped: >= 3 micro-batches committed to the sink (2 commits each)
    val batches = new java.io.File(s"$root/ckpt/offsets").listFiles().length
    assert(batches >= 3, s"expected >=3 capped batches, got $batches")
  }

  test("live CDF stream keeps flowing on a table that ever dropped a column") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite((1L to 4L).map(i => (i, s"k$i", i * 10)).toDF("id", "k", "junk"))
    src.dropColumn("junk") // tombstone lives in the STORED schema forever
    // one LIVE source instance (= one running query), pinned post-drop
    val source = new GraftCdfStreamSource(src, Map.empty)
    val off1 = source.latestOffset(null, ReadLimit.allAvailable())
    // data commits land WHILE the query runs: their log schema carries the
    // tombstone — the source must compare LOGICAL shapes (a tombstone is
    // not an evolution). Before the fix EVERY such getBatch threw "schema
    // changed", permanently breaking CDF streaming for the table.
    src.append(Seq((5L, "k5")).toDF("id", "k"))
    src.delete(col("id") === 1L)
    val off2 = source.latestOffset(off1, ReadLimit.allAvailable())
    val batch = source.getBatch(Some(GraftOffset.parse(off1)), GraftOffset.parse(off2))
    assert(batch.columns.toSet ===
      Set("id", "k", "_change_type", "_commit_version"))
    // a REAL evolution mid-stream still fails loudly
    src.append(Seq((6L, "k6", true)).toDF("id", "k", "extra"))
    val off3 = source.latestOffset(off2, ReadLimit.allAvailable())
    val e = intercept[IllegalStateException](
      source.getBatch(Some(GraftOffset.parse(off2)), GraftOffset.parse(off3)))
    assert(e.getMessage.contains("changed during the CDF stream"))
    // restart (fresh drain, full replay): the dropped-column table's
    // whole history flows, each commit read under ITS OWN mapping
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt",
      Map("startingVersion" -> "1"))
    val got = spark.read.parquet(s"$root/out")
    assert(got.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet === Set(1L))
    assert(!got.columns.contains("junk"))
  }

  test("CDF maxBytesPerTrigger weighs recorded change files (HEAD fallback)") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root).copy(changeDataFeed = true)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite((1L to 40L).map(i => (i, s"k$i")).toDF("id", "k"))
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt") // positions at head
    // a backlog of DML commits: their weight comes ONLY from change files
    // (c.stats holds no entries for them — the HEAD fallback must kick in,
    // or the whole backlog lands in one micro-batch)
    (1L to 4L).foreach(i => src.delete(col("id") === i))
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt",
      Map("maxBytesPerTrigger" -> "1")) // every nonzero weight overflows
    val got = spark.read.parquet(s"$root/out")
    assert(got.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    // admission control split the 4 DML commits into >= 2 micro-batches
    val batches = new java.io.File(s"$root/ckpt/offsets").listFiles().length
    assert(batches >= 3, s"byte-capped CDF backlog drained in $batches batches")
  }

  test("CDF stream fails loudly on a DML commit recorded without change data") {
    val root = tmp()
    // changeDataFeed OFF: the delete records no change rows
    implicit val st: GraftSettings = GraftSettings.local(root)
    val src = GraftTable(spark, s"$root/src")
    src.overwrite((1L to 5L).map(i => (i, s"k$i")).toDF("id", "k"))
    drainCdf(s"$root/src", s"$root/out", s"$root/ckpt")
    src.delete(col("id") === 1L)
    val e = intercept[Exception](drainCdf(s"$root/src", s"$root/out", s"$root/ckpt"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("no recorded change data")))
  }
}
