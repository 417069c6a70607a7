package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** [[GraftFileIndex]]/[[GraftTable.readRelation]] — the log-schema native
  * relation: read parity under schema evolution, analysis-time file
  * pruning reaching the physical scan, parquet filter pushdown, snapshot
  * isolation, and optimizer-visible sizing. */
class GraftFileIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-fidx-").toString

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head

  test("readRelation equals read() across additive schema evolution") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    t.overwrite(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v"))
    // additive evolution: new column w arrives, old column v goes missing
    t.append(Seq((3L, "c", 7L)).toDF("id", "k", "w"))

    val rel = t.readRelation()
    // the log schema is the evolved UNION — narrow batches never shrink it
    assert(rel.columns.sorted.toSeq == Seq("id", "k", "v", "w"))
    val a = rel.select("id", "k", "v", "w").orderBy("id").collect().toSeq
    val b = t.read().select("id", "k", "v", "w").orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(a.last.isNullAt(2) && a.head.isNullAt(3)) // missing cols read NULL

    // a pruned DML rewrite touches only the narrow file — the log schema
    // must remain the union, not shrink to the rewritten file's columns
    t.delete(col("id") === 1L)
    assert(t.readRelation().columns.sorted.toSeq == Seq("id", "k", "v", "w"))
  }

  test("a filter prunes files at the physical scan and pushes into parquet") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    val rows = (0L until 400L).map(i => (i, i % 7, s"r$i")).toDF("k", "g", "s")
    t.appendClustered(rows, Seq("k"), numFiles = 4)
    t.appendClustered((400L until 800L).map(i => (i, i % 7, s"r$i")).toDF("k", "g", "s"),
      Seq("k"), numFiles = 4)
    val total = t.liveFiles().size
    assert(total == 8)

    val q = t.readRelation().filter(col("k") >= 90 && col("k") < 110)
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (90L until 110L).toSeq)
    val scan = scanOf(q)
    // analysis-time skipping: only the batch-1 file covering [90,110) scans
    assert(scan.metrics("numFiles").value < total,
      s"expected pruned scan, got ${scan.metrics("numFiles").value} of $total files")
    // and the residual predicate still reaches the parquet reader
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(k,90)"))
    // parity with the manual readWhere routing
    assert(t.readWhere(col("k") >= 90 && col("k") < 110)
      .collect().map(_.getLong(0)).sorted.toSeq == got)
  }

  test("restrictTo narrows the physical scan and composes with stats atoms") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    t.append((0L until 100L).map(i => (i, s"r$i")).toDF("k", "s").coalesce(1))
    t.append((100L until 200L).map(i => (i, s"r$i")).toDF("k", "s").coalesce(1))
    val index = new GraftFileIndex(t)
    val live = t.liveFiles()
    assert(live.size === 2)
    val lowFile = live.find(f =>
      t.snapshot().stats(f).cols("k").min.exists(_.toLong < 100L)).get
    val narrowed = index.restrictTo(Set(lowFile))
    // the narrowed index lists ONLY the kept file
    val listed = narrowed.listFiles(Nil, Nil).flatMap(_.files)
    assert(listed.map(_.getPath.getName).toSet === Set(lowFile))
    assert(narrowed.inputFiles.length === 1)
    assert(narrowed.sizeInBytes < index.sizeInBytes)
    // stats atoms still apply ON TOP: a filter provably outside the kept
    // file's range lists nothing (intersection, not replacement)
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR, GreaterThan, Literal}
    val kAttr = AR("k", org.apache.spark.sql.types.LongType)()
    val outside = narrowed.listFiles(Nil, Seq(GreaterThan(kAttr, Literal(150L))))
    assert(outside.flatMap(_.files).isEmpty,
      "pushed filter must still prune within the restricted set")
  }

  test("each relation pins its snapshot; a new call sees new commits") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    t.overwrite(Seq((1L, "a")).toDF("id", "k"))
    val rel = t.readRelation()
    assert(rel.count() == 1)
    t.append(Seq((2L, "b")).toDF("id", "k"))
    assert(rel.count() == 1)               // pinned: mid-query commits invisible
    assert(t.readRelation().count() == 2)  // fresh pin sees the append
  }

  test("small relation auto-broadcasts off its live-file sizeInBytes") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val dim = GraftTable(spark, s"$root/dim")
    dim.overwrite((0L until 7L).map(i => (i, s"name$i")).toDF("g", "name"))
    val fact = (0L until 1000L).map(i => (i, i % 7)).toDF("k", "g")
    val j = fact.join(dim.readRelation(), "g") // NO broadcast() hint
    j.collect()
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "expected the optimizer to broadcast the 7-row GraftTable side")
  }

  test("format(\"graft\") round-trips through the registered source") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val path = s"$root/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    df.write.format("graft").mode("overwrite").save(path)
    Seq((3L, "c")).toDF("id", "k").write.format("graft").mode("append").save(path)
    val back = spark.read.format("graft").load(path)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the writes went through the commit protocol, not a raw parquet dump
    assert(GraftTable(spark, path).version == 2)
    // SQL surface off the registered short name
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gt USING graft OPTIONS (path '$path')")
    assert(spark.sql("SELECT count(*) AS n FROM gt").head().getLong(0) == 3)
    // ErrorIfExists refuses, Ignore no-ops
    intercept[IllegalStateException](
      df.write.format("graft").mode("error").save(path))
    df.write.format("graft").mode("ignore").save(path)
    assert(spark.read.format("graft").load(path).count() == 3)
  }

  test("prefix predicates (startsWith / LIKE 'p%') prune files by range bounds") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    val hosts = (0 until 400).map { i =>
      val d = ('a' + i / 100).toChar
      (i.toLong, s"$d${"%03d".format(i % 100)}.example.com")
    }.toDF("id", "host")
    t.appendClustered(hosts, Seq("host"), numFiles = 8)
    assert(t.liveFiles().size == 8)

    // native-relation path: analyzed StartsWith reaches the FileIndex
    val q = t.readRelation().filter(col("host").startsWith("c0"))
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (200L until 300L).toSeq)
    assert(scanOf(q).metrics("numFiles").value < 8)

    // Column path (readWhere / ColumnBridge) prunes the same way
    assert(t.prunedFiles(col("host").startsWith("c0")).size < 8)
    assert(t.readWhere(col("host").startsWith("c0")).count() == 100)

    // a prefix ENDING at the unsafe plane drops the upper bound (lower
    // bound only) — still correct, just less pruning
    assert(t.readWhere(col("host").startsWith("x쿿")).count() == 0)
  }

  test("versionAsOf time-travels the registered source") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val path = s"$root/t"
    val t = GraftTable(spark, path)
    t.overwrite(Seq((1L, "a")).toDF("id", "k"))
    t.append(Seq((2L, "b")).toDF("id", "k"))
    assert(spark.read.format("graft").option("versionAsOf", 1).load(path)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(spark.read.format("graft").load(path).count() == 2)
    // timestampAsOf resolves to the newest commit at or before the instant
    val t1 = java.time.Instant.ofEpochMilli(t.commits().head.timestampMs)
    assert(spark.read.format("graft").option("timestampAsOf", t1.toString)
      .load(path).select("id").as[Long].collect().toSeq == Seq(1L))
    val t2 = java.time.Instant.ofEpochMilli(t.commits().last.timestampMs)
    assert(spark.read.format("graft").option("timestampAsOf", t2.toString)
      .load(path).count() == 2)
    // before the first commit: loud, not empty
    intercept[IllegalArgumentException](
      spark.read.format("graft")
        .option("timestampAsOf", t1.minusSeconds(3600).toString).load(path))
  }

  test("readChangeFeed serves the CDF rows through the format") {
    val root = tmp()
    implicit val st: GraftSettings =
      GraftSettings.local(root).copy(changeDataFeed = true)
    val path = s"$root/t"
    val t = GraftTable(spark, path)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    t.delete(col("id") === 1L)
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(path)
    val got = feed.select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "delete", 2L)))
    // startingVersion is INCLUSIVE (Delta convention): 1 sees v1's inserts
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(path).count() == 3)
  }

  test("empty and missing tables behave") {
    val root = tmp()
    implicit val st: GraftSettings = GraftSettings.local(root)
    val t = GraftTable(spark, s"$root/t")
    intercept[IllegalStateException](t.readRelation())
    t.overwrite(Seq((1L, "a")).toDF("id", "k"))
    t.delete(col("id") === 1L)
    assert(t.readRelation().count() == 0) // live set empty, schema preserved
  }
}
