package graft.tables

import java.nio.file.{Files, Path => JPath, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.conf.GraftSettings


/** Golden cross-round compatibility corpus (the Delta acceptance-test
  * shape): each round freezes a REAL mini-lake written by that round's
  * binary into `src/test/resources/compat/<round>/`, and [[CompatSpec]]
  * asserts the CURRENT binary reads every frozen round's tables
  * identically — versions, rows, features, time travel, CDF. Back-compat
  * against hand-stripped synthetic commits (GraftProtocolSpec's pre-gate
  * tests) proves the decoder tolerates absent fields; THIS proves the
  * full real format — data files + commits + checkpoints + DV sidecars +
  * constraint/property sidecars + column-mapping metadata — and it is
  * impossible to retrofit once old binaries are gone.
  *
  * One function ([[observe]]) defines "identically": the generator
  * freezes its output as `expectations.json`, the spec re-runs it and
  * compares the JSON ASTs. Every probe is deterministic (fixed literals,
  * sorted collects, sha-256 content digests); refusals are part of the
  * contract and observe as the `Refused` sentinel — a trimmed log must
  * KEEP refusing sub-horizon time travel in every future round. */
object CompatCorpus {
  implicit val fmts: Formats = DefaultFormats

  /** Sentinel for a probe the generating binary could not serve (e.g.
    * time travel below a vacuumed horizon). Future binaries must refuse
    * the same probes — serving rows where r18 refused would mean
    * invented history. */
  val Refused = -1L

  case class TableObs(
      version: Long,
      rows: Long,
      contentSha: String,
      columns: Seq[String],
      readerFeatures: Seq[String],
      writerFeatures: Seq[String],
      liveFiles: Int,
      historyRows: Long,
      readAtRows: Map[String, Long], // version -> rows (Refused = threw)
      cdfByType: Map[String, Long]) // _change_type -> rows (Refused key = threw)

  /** Deterministic digest of a frame's CONTENT: rows rendered under
    * name-sorted columns, sorted, sha-256'd — independent of file layout,
    * partitioning, and row order. */
  private def contentSha(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val lines = df.select(cols.map(col): _*).collect()
      .map(_.toString).sorted.mkString("\n")
    MessageDigest.getInstance("SHA-256")
      .digest(lines.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Table set is discovered from the frozen lake itself, so older corpora
    * (r18: main/convert/trimmed) and newer ones that freeze extra surfaces
    * (r19+: appendonly) share one observer with zero per-round code. */
  def observe(spark: SparkSession, lakeDir: String): Map[String, TableObs] = {
    val names = Option(new java.io.File(lakeDir).listFiles())
      .getOrElse(Array.empty).toSeq
      .filter(_.isDirectory).map(_.getName).sorted
    require(names.nonEmpty, s"no tables under $lakeDir")
    names.map { name =>
      val t = GraftTable(spark, s"$lakeDir/$name")(GraftSettings.default)
      val snap = t.snapshot()
      val df = t.read()
      val readAt = (1L to snap.version).map { v =>
        v.toString -> (try t.readAt(v).count() catch { case _: Exception => Refused })
      }.toMap
      val cdf =
        try t.readChanges(0).groupBy("_change_type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        catch { case _: Exception => Map("__refused" -> Refused) }
      name -> TableObs(
        version = snap.version,
        rows = df.count(),
        contentSha = contentSha(df),
        columns = df.columns.toSeq,
        readerFeatures = snap.featureSet.toSeq.sorted,
        writerFeatures = snap.writerFeatureSet.toSeq.sorted,
        liveFiles = snap.live.size,
        historyRows = t.history().count(),
        readAtRows = readAt,
        cdfByType = cdf)
    }.toMap
  }

  /** Build the mini-lake. Fixed literals only — re-runnable, but the
    * POINT is to run it once per round and freeze the bytes. */
  def build(spark: SparkSession, lakeDir: String): Unit = {
    import spark.implicits._
    val gen = GraftSettings.default.copy(
      deletionVectors = true, changeDataFeed = true, logCheckpointInterval = 4)

    // -- main: appends + constraint + DV delete/update + column mapping +
    //    CDF + checkpoints + a governed drop-feature commit
    val main = GraftTable(spark, s"$lakeDir/main")(gen)
    main.append((1 to 20).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))
    // behavior travels WITH the table, not the session
    main.setProperties(Map(
      "deletion_vectors" -> "true", "change_data_feed" -> "true"))
    main.addConstraint("id_pos", "id > 0")
    main.append((21 to 30).map(i => (i, s"v$i")).toDF("id", "v"))
    main.delete(col("id") === 3 || col("id") === 7) // DV sidecars
    main.renameColumn("v", "w") // column mapping: files keep physical "v"
    main.update(col("id") === 5, Map("w" -> lit("five")))
    main.append((31 to 35).map(i => (i, s"w$i")).toDF("id", "w"))
    // governed downgrade: shed the constraint, then drop its gate — the
    // corpus carries a real drop_feature commit + its forced checkpoint
    main.dropConstraint("id_pos")
    main.dropFeature(GraftProtocol.CheckConstraints)

    // -- convert: a hive-partitioned tree adopted in place
    val convDir = s"$lakeDir/convert"
    Seq((1, "a", "eu"), (2, "b", "us"), (3, "c", "eu"), (4, "d", "ap"))
      .toDF("id", "v", "region")
      .repartition(1).write.partitionBy("region").parquet(convDir)
    val conv = GraftTable(spark, convDir)(gen)
    conv.convert()
    conv.append(Seq((5, "e", "eu")).toDF("id", "v", "region"))

    // -- appendonly (r19+ corpora): a table holding its writers to the
    //    append_only gate — the frozen commit carries the writer feature,
    //    so every future binary must keep OBSERVING the stamp (and its
    //    own protocol layer keeps refusing row removal on it)
    val ao = GraftTable(spark, s"$lakeDir/appendonly")(GraftSettings.default)
    ao.append((1 to 8).map(i => (i, i * 10)).toDF("id", "qty"))
    ao.setProperties(Map("append_only" -> "true"))
    ao.append(Seq((9, 90), (10, 100)).toDF("id", "qty"))

    // -- trimmed: checkpoint-only cold open (vacuumLog horizon) — future
    //    binaries must serve from the checkpoint AND keep refusing
    //    sub-horizon history
    val tr = GraftTable(spark, s"$lakeDir/trimmed")(
      GraftSettings.default.copy(logCheckpointInterval = 2))
    (1 to 6).foreach(i => tr.append(Seq((i, s"t$i")).toDF("id", "v")))
    tr.delete(col("id") === 2)
    tr.vacuumLog(retainVersions = 2)
  }

  def writeExpectations(obs: Map[String, TableObs], file: JPath): Unit =
    Files.writeString(file, Serialization.writePretty(obs))

  def readExpectations(file: JPath): Map[String, TableObs] =
    JsonMethods.parse(Files.readString(file)).extract[Map[String, TableObs]]
}

/** One-shot generator: `Test/runMain graft.tables.CompatCorpusGen
  * src/test/resources/compat/<round>` — run ONCE per round, commit the
  * output. The spec never regenerates; it reads the frozen bytes. */
object CompatCorpusGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: CompatCorpusGen <outDir>"))
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // guard the ROUND dir, not just the lake: a round with a surviving
    // expectations.json but a lost lake must never be silently re-frozen
    // against the current binary (that would certify the binary against
    // itself instead of against the round that froze the corpus)
    require(!Files.exists(Paths.get(outDir)),
      s"$outDir already exists — a frozen corpus is never regenerated")
    val lake = s"$outDir/lake"
    CompatCorpus.build(spark, lake)
    CompatCorpus.writeExpectations(
      CompatCorpus.observe(spark, lake), Paths.get(outDir, "expectations.json"))
    println(s"[compat] corpus frozen at $outDir")
    spark.stop()
  }
}
