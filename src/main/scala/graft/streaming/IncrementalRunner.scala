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
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"failed to commit checkpoint $checkpointPath")
  }

  def deleteCheckpoint(spark: SparkSession, checkpointPath: String): Unit =
    FsUtils.deletePath(spark, checkpointPath)

  /** Process everything new since the checkpoint as ONE batch, then advance
    * the checkpoint. Returns true when a batch ran. */
  def runOnce(
      spark: SparkSession,
      table: GraftTable,
      checkpointPath: String)(process: DataFrame => Unit): Boolean = {
    val from = lastProcessedVersion(spark, checkpointPath)
    val to = table.version
    val newFiles = table.changesSince(from)
    if (newFiles.isEmpty) {
      if (to > from) writeCheckpoint(spark, checkpointPath, to)
      return false
    }
    val batch = spark.read.option("mergeSchema", "true").parquet(newFiles: _*)
    process(batch)
    writeCheckpoint(spark, checkpointPath, to)
    true
  }
}
