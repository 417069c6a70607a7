package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** Reader-feature gating ([[GraftProtocol]], Delta's readerFeatures): the
  * log is a DURABLE format, so a commit whose content a reader cannot
  * interpret must refuse the whole table with the feature NAMED — on every
  * read surface — instead of silently resurrecting deleted rows (dv),
  * leaking physical names (column_mapping), or dropping partition values
  * (partition_convert). Absent feature sets decode as baseline, so every
  * pre-gate table keeps reading unchanged. */
class GraftProtocolSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-proto-").toString

  private def writeRawCommit(path: String, c: Commit): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(path, "_graft_log")
    fs.mkdirs(logDir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(logDir, f"${c.version}%020d.json"), false)
    try out.write(org.json4s.jackson.Serialization.write(c).getBytes("UTF-8"))
    finally out.close()
  }

  test("commits stamp required reader features from their content") {
    val root = tmp()
    // baseline append: no features field at all (zero extra log bytes)
    val plain = GraftTable(spark, s"$root/plain")(GraftSettings.default)
    plain.append(Seq((1, "a")).toDF("id", "v"))
    assert(plain.commits().last.features === None)
    // a DV-binding delete stamps "dv"
    val dvT = GraftTable(spark, s"$root/dv")(
      GraftSettings.default.copy(deletionVectors = true))
    dvT.append((1 to 20).map(i => (i, s"v$i")).toDF("id", "v"))
    dvT.delete(col("id") === 3)
    assert(dvT.commits().last.features === Some(Seq(GraftProtocol.Dv)))
    // a column-mapping rename stamps "column_mapping"
    dvT.renameColumn("v", "w")
    assert(dvT.commits().last.features
      === Some(Seq(GraftProtocol.ColumnMappingFeature)))
    // adopting a hive tree stamps "partition_convert"
    val convDir = s"$root/conv"
    Seq((1, "x", "eu"), (2, "y", "us")).toDF("id", "v", "region")
      .write.partitionBy("region").parquet(convDir)
    val conv = GraftTable(spark, convDir)(GraftSettings.default)
    conv.convert()
    assert(conv.commits().last.features
      === Some(Seq(GraftProtocol.PartitionConvert)))
    // snapshot unions them; all known -> every read surface still serves
    assert(dvT.read().count() === 19)
    assert(conv.read().count() === 2)
  }

  test("a future-feature commit refuses EVERY read surface, feature named") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(GraftSettings.default)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val schema = Seq((0, "")).toDF("id", "v").schema.json
    writeRawCommit(path, Commit(2L, "append", dataChange = true,
      timestampMs = System.currentTimeMillis(),
      add = Seq.empty, remove = Seq.empty, schemaJson = schema,
      metrics = Map.empty, features = Some(Seq("v99_row_encryption"))))

    def assertRefused(body: => Any): Unit = {
      val e = intercept[Exception](body)
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).mkString(" | ")
      assert(msgs.contains("v99_row_encryption") && msgs.contains("requires reader feature"),
        s"error must NAME the feature, got: $msgs")
    }
    // batch
    assertRefused(GraftTable(spark, path)(GraftSettings.default).read().collect())
    // SQL
    spark.sql("DROP TABLE IF EXISTS proto_gate")
    assertRefused {
      spark.sql(s"CREATE TABLE proto_gate USING graft LOCATION '$path'")
      spark.sql("SELECT * FROM proto_gate").collect()
    }
    spark.sql("DROP TABLE IF EXISTS proto_gate")
    // native relation
    assertRefused(spark.read.format("graft").load(path).collect())
    // streaming
    assertRefused {
      val q = spark.readStream.format("graft").load(path)
        .writeStream.format("memory").queryName("proto_gate_stream")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // CDF / per-commit history surfaces
    val fresh = GraftTable(spark, path)(GraftSettings.default)
    assertRefused(fresh.changesByVersion(0L))
    assertRefused(fresh.history().collect())
    // writers gate transitively (append pins the current schema via
    // snapshot): a foreign binary cannot corrupt a future-feature table
    assertRefused(fresh.append(Seq((3, "c")).toDF("id", "v")))
    // time travel BELOW the future commit still serves (Delta semantics:
    // the protocol gates the versions that need it, not the ones before)
    assert(GraftTable(spark, path)(GraftSettings.default)
      .readAt(1).count() === 2)
  }

  test("a future-feature CHECKPOINT refuses (gating survives a log trim)") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(GraftSettings.default)
    t.append(Seq((1, "a")).toDF("id", "v"))
    // hand-written future checkpoint: the only record that outlives
    // vacuumLog, so it must gate on its own
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ck = LogCheckpoint(1L, t.liveFiles(), Some(t.read().schema.json),
      Map.empty, features = Some(Seq("v99_row_encryption")))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_graft_log", f"${1L}%020d.checkpoint.json"), false)
    try out.write(org.json4s.jackson.Serialization.write(ck).getBytes("UTF-8"))
    finally out.close()
    val e = intercept[UnsupportedTableFeatureException](
      GraftTable(spark, path)(GraftSettings.default).read().collect())
    assert(e.getMessage.contains("v99_row_encryption")
      && e.getMessage.contains("checkpoint v1"))
  }

  test("a PRE-GATE history self-heals: content-derived features gate the next checkpoint") {
    // a log written before feature stamping existed: DV bindings present,
    // but no commit carries a features field. The snapshot must derive
    // the gate from CONTENT, so the next checkpoint carries it and a
    // trimmed table still refuses feature-blind readers.
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable(spark, path)(
      GraftSettings.default.copy(deletionVectors = true))
    t.append((1 to 20).map(i => (i, s"v$i")).toDF("id", "v"))
    t.delete(col("id") === 7) // stamped commit...
    // ...then REWRITE both commits without their features fields, exactly
    // the bytes a pre-gate binary wrote
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    t.commits().foreach { c =>
      val stripped = c.copy(features = None)
      val p = new org.apache.hadoop.fs.Path(
        s"$path/_graft_log", f"${c.version}%020d.json")
      fs.delete(p, false)
      val out = fs.create(p, false)
      try out.write(org.json4s.jackson.Serialization.write(stripped).getBytes("UTF-8"))
      finally out.close()
    }
    val fresh = GraftTable(spark, path)(GraftSettings.default)
    assert(fresh.commits().forall(_.features.isEmpty), "precondition: pre-gate log")
    assert(fresh.snapshot().featureSet === Set(GraftProtocol.Dv),
      "content-derived union must recover the dv gate from a pre-gate log")
    assert(fresh.read().count() === 19, "and the table still reads normally")
  }

  test("checkpoints persist the feature union; parquet twin round-trips it") {
    val root = tmp()
    val t = GraftTable(spark, s"$root/t")(
      GraftSettings(logCheckpointInterval = 2, deletionVectors = true))
    t.append((1 to 10).map(i => (i, s"v$i")).toDF("id", "v"))
    t.delete(col("id") === 4) // v2: DV commit -> checkpoint at cadence
    val snap = t.snapshot()
    assert(snap.featureSet === Set(GraftProtocol.Dv))
    // the parquet twin carries it in the footer
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpt = new org.apache.hadoop.fs.Path(
      s"${t.path}/_graft_log", f"${2L}%020d.checkpoint.parquet")
    assert(fs.exists(ckpt), "cadence checkpoint missing")
    val back = ParquetCheckpoint.read(spark, fs,
      spark.sessionState.newHadoopConf(), ckpt, Long.MaxValue)
    assert(back.featureSet === Set(GraftProtocol.Dv))
    // later baseline commits keep the union monotone
    t.append(Seq((11, "k")).toDF("id", "v"))
    assert(t.snapshot().featureSet === Set(GraftProtocol.Dv))
  }
}
