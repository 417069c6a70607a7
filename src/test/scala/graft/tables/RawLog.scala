package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Test support: hand-lay a raw commit JSON into a table's log, bypassing
  * every gate — the tool for forging future-feature commits and pre-gate
  * histories. ONE serialization so every suite forges the same log shape
  * ([[GraftProtocolSpec]], [[GraftPreWriteGateSpec]]). */
object RawLog {
  def writeRawCommit(spark: SparkSession, path: String, c: Commit): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(path, "_graft_log")
    fs.mkdirs(logDir)
    val out = fs.create(new Path(logDir, f"${c.version}%020d.json"), false)
    try out.write(org.json4s.jackson.Serialization.write(c).getBytes("UTF-8"))
    finally out.close()
  }
}
