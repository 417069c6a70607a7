package graft.lake

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem utilities (reference `jibaro/utils.py:11-34` — `path_exists`,
  * `delete_path`). The reference reaches the Hadoop FS through py4j; we call
  * it directly on the JVM, so these are thin, exception-safe wrappers that
  * resolve the correct `FileSystem` per-URI (file://, s3a://, hdfs://, ...).
  */
object FsUtils {

  def fs(spark: SparkSession, path: String): FileSystem = {
    graft.api.GraftSession.requireClassic(spark.getClass.getName,
      "the graft table/lake Scala API (driver-side filesystem + commit-log access)")
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  def pathExists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Recursive delete; returns false when the path did not exist. */
  def deletePath(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  def mkdirs(spark: SparkSession, path: String): Boolean =
    fs(spark, path).mkdirs(new Path(path))

  /** Non-recursive listing; empty when the path does not exist. */
  def list(spark: SparkSession, path: String): Seq[FileStatus] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty else f.listStatus(p).toSeq
  }

  /** All data files under `path`, recursively, skipping hidden files and
    * metadata trees (`_`/`.`-prefixed — Spark convention). */
  def dataFiles(spark: SparkSession, path: String): Seq[FileStatus] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return Seq.empty
    def visible(p: Path): Boolean = {
      val n = p.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def walk(p: Path): Seq[FileStatus] =
      f.listStatus(p).toSeq.filter(st => visible(st.getPath)).flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st)
      }
    walk(root)
  }

  def totalSizeBytes(spark: SparkSession, path: String): Long =
    dataFiles(spark, path).map(_.getLen).sum
}
