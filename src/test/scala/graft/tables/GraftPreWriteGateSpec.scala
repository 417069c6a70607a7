package graft.tables

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** Pre-staging protocol gating (Delta checks protocol at transaction
  * START): a table this binary may not write must refuse BEFORE any
  * parquet is staged — r18 gated at the commit funnel, which is correct
  * but pays a full batch write (and leaves an orphan staging dir until
  * vacuum) just to learn the commit would refuse; at 100 TB ingest rates
  * that is a wasted table-dir write per gated batch. The zero-new-files
  * assertions here are the contract; the funnel check stays the
  * authoritative TOCTOU backstop (last test). */
class GraftPreWriteGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-pregate-").toString

  private def writeRawCommit(path: String, c: Commit): Unit =
    RawLog.writeRawCommit(spark, path, c)

  /** EVERY path under the table dir — files AND directories — so even an
    * empty aborted staging dir fails the invariance check. */
  private def listAll(path: String): Set[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val self = s"${st.getPath}:${if (st.isDirectory) "dir" else st.getLen.toString}"
        if (st.isDirectory) self +: walk(st.getPath) else Seq(self)
      }
    walk(new Path(path)).toSet
  }

  private def causes(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")

  test("a future WRITER feature refuses every write with ZERO files created") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(GraftSettings.default)
    t.append((1 to 10).map(i => (i, s"v$i")).toDF("id", "v"))
    // CDF property first (a feature THIS binary upholds): the SQL DML
    // paths then stage change rows BEFORE their rewrite — exactly the
    // files the pre-gate must keep from ever existing
    t.setProperties(Map("change_data_feed" -> "true"))
    writeRawCommit(path, Commit(t.version + 1, "append", dataChange = true,
      timestampMs = System.currentTimeMillis(),
      add = Seq.empty, remove = Seq.empty,
      schemaJson = Seq((0, "")).toDF("id", "v").schema.json,
      metrics = Map.empty, writerFeatures = Some(Seq("v99_row_tracking"))))

    val fresh = GraftTable(spark, path)(GraftSettings.default)
    assert(fresh.read().count() === 10) // reads keep serving

    val before = listAll(path)
    def refusedZeroFiles(body: => Any): Unit = {
      val msgs = causes(intercept[Exception](body))
      assert(msgs.contains("v99_row_tracking") &&
        msgs.contains("requires writer feature"),
        s"error must NAME the writer feature, got: $msgs")
      assert(listAll(path) === before,
        "a pre-stage refusal must leave the table dir byte-identical — " +
          "no staging dir, no data files, no change files")
    }

    refusedZeroFiles(fresh.append(Seq((11, "k")).toDF("id", "v")))
    refusedZeroFiles(fresh.overwrite(Seq((1, "z")).toDF("id", "v")))
    refusedZeroFiles(fresh.delete(col("id") === 3))
    refusedZeroFiles(fresh.update(col("id") === 3, Map("v" -> lit("x"))))
    refusedZeroFiles(fresh.upsert(
      Seq((1, "z", "u")).toDF("id", "v", "op"), Seq("id"), "op"))

    // SQL DML (the captured-plan paths stage CDF change rows before their
    // rewrite — the entry-point gate must fire first)
    spark.sql("DROP TABLE IF EXISTS pregate_t")
    spark.sql(s"CREATE TABLE pregate_t USING graft LOCATION '$path'")
    try {
      refusedZeroFiles(spark.sql("DELETE FROM pregate_t WHERE id = 3"))
      refusedZeroFiles(spark.sql(
        "UPDATE pregate_t SET v = 'x' WHERE id IN (SELECT id FROM pregate_t WHERE id = 3)"))
      Seq((3, "m", "u")).toDF("id", "v", "op").createOrReplaceTempView("pregate_src")
      refusedZeroFiles(spark.sql(
        """MERGE INTO pregate_t t USING pregate_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin))
    } finally spark.sql("DROP TABLE IF EXISTS pregate_t")
  }

  test("append-only refuses row-removing writes with ZERO files created") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(
      GraftSettings.default.copy(changeDataFeed = true))
    t.append((1 to 10).map(i => (i, s"v$i")).toDF("id", "v"))
    t.setProperties(Map("append_only" -> "true", "change_data_feed" -> "true"))

    val before = listAll(path)
    def refusedZeroFiles(body: => Any): Unit = {
      val msgs = causes(intercept[Exception](body))
      assert(msgs.contains("append-only"), s"got: $msgs")
      assert(listAll(path) === before,
        "an append-only refusal must leave the table dir byte-identical")
    }
    refusedZeroFiles(t.delete(col("id") === 3))
    refusedZeroFiles(t.update(col("id") === 3, Map("v" -> lit("x"))))
    refusedZeroFiles(t.overwrite(Seq((1, "z")).toDF("id", "v")))
    refusedZeroFiles(t.upsert(
      Seq((3, "z", "u")).toDF("id", "v", "op"), Seq("id"), "op"))

    // appends still land; a delete whose predicate prunes to NO stored
    // file stays a no-op (nothing would be removed — matches the funnel's
    // remove-scope predicate exactly, so the pre-gate is never stricter)
    t.append(Seq((11, "k")).toDF("id", "v"))
    assert(t.delete(col("id") === 999) === None)
    assert(t.read().count() === 11)
  }

  test("an insert-only upsert touching no stored file still lands on append-only") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(GraftSettings.default)
    // clustered layout => tight per-file key ranges => a disjoint-key
    // batch prunes to zero affected files (the pure-insert CDC shape)
    t.appendClustered((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), numFiles = 4)
    t.setProperties(Map("append_only" -> "true"))
    t.upsert(Seq((1000, "new", "c")).toDF("id", "v", "op"), Seq("id"), "op")
    assert(t.read().count() === 101)
    // the same batch aimed at stored keys refuses (it would rewrite files)
    val e = intercept[IllegalStateException](
      t.upsert(Seq((1, "z", "u")).toDF("id", "v", "op"), Seq("id"), "op"))
    assert(e.getMessage.contains("append-only"))
  }

  test("TOCTOU: a writer-feature commit interleaving after the pre-gate still refuses at the funnel") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(GraftSettings.default)
    t.append((1 to 10).map(i => (i, s"v$i")).toDF("id", "v"))
    // the pre-gate passes (no foreign feature yet); the foreign commit
    // lands in the snapshot->publish window via the rewrite seam — the
    // commit-funnel check must still refuse, so the gate is never a
    // read-then-act hole
    var fired = false
    t.onBeforeRewriteCommit = () => if (!fired) {
      fired = true
      writeRawCommit(path, Commit(t.version + 1, "append", dataChange = true,
        timestampMs = System.currentTimeMillis(),
        add = Seq.empty, remove = Seq.empty,
        schemaJson = Seq((0, "")).toDF("id", "v").schema.json,
        metrics = Map.empty, writerFeatures = Some(Seq("v99_row_tracking"))))
    }
    val msgs = causes(intercept[Exception](t.delete(col("id") === 3)))
    assert(fired)
    assert(msgs.contains("v99_row_tracking") &&
      msgs.contains("requires writer feature"),
      s"the funnel must refuse the interleaved feature, got: $msgs")
    // the table is intact and still serves
    assert(GraftTable(spark, path)(GraftSettings.default).read().count() === 10)
  }
}
