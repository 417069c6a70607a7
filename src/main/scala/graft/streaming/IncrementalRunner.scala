package graft.streaming

import graft.lake.FsUtils
import graft.tables.GraftTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-to-drain incremental consumption over a [[GraftTable]] — the engine's
  * equivalent of the reference's `readStream.format("delta") ... foreachBatch
  * + Trigger.Once` loops (`jibaro/datalake/cdc.py:121-126,250-256`).
  *
  * The checkpoint is the last processed table version, committed AFTER the
  * batch function returns — so a crash before the checkpoint write replays
  * the batch (at-least-once into idempotent batch functions; the CDC apply
  * is idempotent because it is keyed, like the reference's MERGE).
  * Compaction commits (`dataChange = false`) are invisible, matching the
  * reference's reliance on Delta's dataChange flag.
  */
object IncrementalRunner {

  def lastProcessedVersion(spark: SparkSession, checkpointPath: String): Long = {
    val fs = FsUtils.fs(spark, checkpointPath)
    val p = new Path(checkpointPath, "version")
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private def writeCheckpoint(spark: SparkSession, checkpointPath: String, v: Long): Unit = {
    val fs = FsUtils.fs(spark, checkpointPath)
    fs.mkdirs(new Path(checkpointPath))
    val tmp = new Path(checkpointPath, s".version.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(checkpointPath, "version")
    // single OVERWRITE rename — no delete-then-rename window where a crash
    // loses the mark and the next run replays the table's WHOLE history
    // (the tableChangesToKafka cursor-advance discipline)
    try
      org.apache.hadoop.fs.FileContext
        .getFileContext(fs.getUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // connectors without an AbstractFileSystem binding fall back to
        // delete+rename: a small non-atomic window beats never advancing
        fs.delete(dst, false)
        if (!fs.rename(tmp, dst))
          throw new IllegalStateException(s"failed to commit checkpoint $checkpointPath")
    }
  }

  def deleteCheckpoint(spark: SparkSession, checkpointPath: String): Unit =
    FsUtils.deletePath(spark, checkpointPath)

  /** Process everything new since the checkpoint in bounded, checkpointed
    * batches, committing the checkpoint after EACH batch. Returns true when
    * at least one batch ran.
    *
    * `maxFilesPerBatch` mirrors the reference's deliberate rate caps
    * (`maxFilesPerTrigger=1000`, `jibaro/datalake/protobuf_handler.py:157`;
    * `maxOffsetsPerTrigger=100000`, `cdc.py:29`): a week of backlog at
    * scale must NOT become one giant merge — it drains as a sequence of
    * bounded batches, each individually recoverable. Batches always end on
    * a commit-version boundary (a version's files are never split), so a
    * crash replays whole versions into the idempotent batch function.
    * `maxFilesPerBatch <= 0` disables the cap. */
  def runOnce(
      spark: SparkSession,
      table: GraftTable,
      checkpointPath: String,
      maxFilesPerBatch: Int = 1000)(process: DataFrame => Unit): Boolean = {
    val from = lastProcessedVersion(spark, checkpointPath)
    val to = table.version
    val byVersion = table.changesByVersion(from)
    if (byVersion.isEmpty) {
      if (to > from) writeCheckpoint(spark, checkpointPath, to)
      return false
    }
    var ran = false
    var chunkFiles = Vector.empty[String]
    var chunkVersion = from
    def flush(): Unit = if (chunkFiles.nonEmpty || chunkVersion > from) {
      if (chunkFiles.nonEmpty) {
        val batch = spark.read.option("mergeSchema", "true").parquet(chunkFiles: _*)
        process(batch)
        ran = true
      }
      writeCheckpoint(spark, checkpointPath, chunkVersion)
      chunkFiles = Vector.empty
    }
    byVersion.foreach { case (version, files) =>
      val wouldOverflow = maxFilesPerBatch > 0 && chunkFiles.nonEmpty &&
        chunkFiles.size + files.size > maxFilesPerBatch
      if (wouldOverflow) flush()
      chunkFiles ++= files
      chunkVersion = version
    }
    flush()
    // trailing non-dataChange commits (e.g. compactions) advance the mark too
    if (to > chunkVersion) writeCheckpoint(spark, checkpointPath, to)
    ran
  }
}
