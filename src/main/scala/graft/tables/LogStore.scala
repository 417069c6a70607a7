package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomicity seam for commit-version claims — the piece of the commit
  * protocol that is STORAGE-SPECIFIC (Delta's pluggable LogStore).
  *
  * [[GraftTable]]'s protocol needs exactly one primitive from storage:
  * "atomically become the only writer allowed to publish version file
  * `name`". On local filesystems and HDFS an O_EXCL create provides it
  * ([[HadoopOExclLogStore]], the default). On S3-class object stores
  * O_EXCL does not exist — an S3 implementation must supply the same
  * contract through a conditional PUT (`If-None-Match: *` on S3 today,
  * the precondition header on GCS/Azure) or an external arbiter (a
  * DynamoDB conditional write, Delta's S3DynamoDBLogStore) keyed by
  * `(logDir, name)`. Everything else in the protocol (write-temp,
  * rename-to-publish, existence re-check under the claim, loser-retries)
  * is storage-agnostic and stays in [[GraftTable.writeCommit]].
  *
  * CONTRACT (what any implementation must guarantee):
  *  - `tryClaim(logDir, name)` returns true for AT MOST ONE concurrent
  *    caller per `(logDir, name)` until that winner calls `release` —
  *    across processes, not just threads;
  *  - `release` makes the claim available again (the version file's own
  *    existence check under the claim handles the finished-writer case);
  *  - a crashed winner must not deadlock the table forever: the default
  *    impl leaves a `.claim` marker that an operator can remove; an
  *    arbiter-backed impl should lease/expire instead.
  *
  * Selected per session via `spark.graft.logStore.class` (a fully
  * qualified class name with a no-arg constructor), mirroring Delta's
  * `spark.delta.logStore.class`. Misconfiguration fails loudly at first
  * commit, never silently degrades to non-atomic claims.
  */
trait LogStore {
  /** Atomically claim exclusive right to publish `name` under `logDir`;
    * true iff this caller won the claim. */
  def tryClaim(fs: FileSystem, logDir: Path, name: String): Boolean

  /** Release a claim previously won by [[tryClaim]]. */
  def release(fs: FileSystem, logDir: Path, name: String): Unit
}

/** Default [[LogStore]]: an O_EXCL file create of `.name.claim` — atomic
  * on local filesystems and HDFS (`FileSystem.create(path, false)` maps
  * to an exclusive create). NOT safe on S3A (create-no-overwrite is
  * check-then-put there): deploy an arbiter-backed store for S3. */
final class HadoopOExclLogStore extends LogStore {
  override def tryClaim(fs: FileSystem, logDir: Path, name: String): Boolean =
    try { fs.create(new Path(logDir, s".$name.claim"), false).close(); true }
    catch { case _: java.io.IOException => false }

  override def release(fs: FileSystem, logDir: Path, name: String): Unit =
    fs.delete(new Path(logDir, s".$name.claim"), false)
}

object LogStore {
  val ConfKey = "spark.graft.logStore.class"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** The session's configured store (defaults to
    * [[HadoopOExclLogStore]]), instantiated once per class name. */
  def forSession(spark: SparkSession): LogStore = {
    val cls = spark.conf.get(ConfKey, classOf[HadoopOExclLogStore].getName)
    cache.computeIfAbsent(cls, c =>
      Class.forName(c).getDeclaredConstructor().newInstance() match {
        case s: LogStore => s
        case other => throw new IllegalArgumentException(
          s"$ConfKey=$c is not a graft.tables.LogStore: ${other.getClass}")
      })
  }
}
