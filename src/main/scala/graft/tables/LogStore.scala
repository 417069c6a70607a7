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
  *  - a crashed winner must not deadlock the table forever: claims carry
  *    a LEASE — [[claimAgeMs]] exposes how long the outstanding claim has
  *    been held, [[breakClaim]] clears one believed expired, and
  *    [[stillHeld]] lets the winner re-verify its own claim is still in
  *    force immediately before publishing. [[GraftTable.writeCommit]]
  *    composes these: a contender that finds the claim older than
  *    `spark.graft.logStore.claimTtlMs` breaks it and re-claims (no FSCK
  *    needed), and every winner re-verifies before its publish rename so
  *    a slow-but-alive writer whose lease was broken ABORTS instead of
  *    overwriting the usurper's commit. A store that cannot observe claim
  *    age keeps the defaults (never break, always held) and falls back to
  *    operator-driven FSCK recovery.
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

  /** How long the CURRENT claim on `(logDir, name)` has been outstanding,
    * if this store can observe it; `None` when no claim is visible or the
    * store has no lease support (→ claims are never broken). */
  def claimAgeMs(fs: FileSystem, logDir: Path, name: String): Option[Long] = None

  /** Forcibly clear a claim believed expired. Safe to race: at most one
    * subsequent [[tryClaim]] wins regardless of how many breakers ran. */
  def breakClaim(fs: FileSystem, logDir: Path, name: String): Unit = ()

  /** Whether the claim THIS caller won via [[tryClaim]] is still in force
    * (not broken, not usurped). Consulted by the winner immediately before
    * its publish rename; defaults to true for stores without lease
    * support. */
  def stillHeld(fs: FileSystem, logDir: Path, name: String): Boolean = true
}

/** Default [[LogStore]]: an O_EXCL file create of `.name.claim` — atomic
  * on local filesystems and HDFS (`FileSystem.create(path, false)` maps
  * to an exclusive create). NOT safe on S3A (create-no-overwrite is
  * check-then-put there): deploy an arbiter-backed store for S3.
  *
  * Lease support: the marker's mtime is the lease clock and its CONTENT
  * is a per-winner token (written right after the exclusive create), so
  * [[stillHeld]] detects both a broken claim (marker gone) and a
  * broken-then-reclaimed one (marker holds a FOREIGN token), and
  * [[release]] never deletes a usurper's marker. */
class HadoopOExclLogStore extends LogStore {
  // token per (logDir, name) claim won by THIS process — ConcurrentHashMap
  // because one cached store instance serves every table/thread in the JVM
  private val tokens =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def key(logDir: Path, name: String) = s"$logDir/$name"
  private def marker(logDir: Path, name: String) =
    new Path(logDir, s".$name.claim")

  override def tryClaim(fs: FileSystem, logDir: Path, name: String): Boolean =
    try {
      val out = fs.create(marker(logDir, name), false) // the atomic step
      val token = java.util.UUID.randomUUID().toString
      try out.write(token.getBytes("UTF-8")) finally out.close()
      tokens.put(key(logDir, name), token)
      true
    } catch { case _: java.io.IOException => false }

  private def readToken(fs: FileSystem, logDir: Path, name: String): Option[String] =
    try {
      val in = fs.open(marker(logDir, name))
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(if (n <= 0) "" else new String(buf, 0, n, "UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  override def release(fs: FileSystem, logDir: Path, name: String): Unit = {
    val mine = tokens.remove(key(logDir, name))
    // delete only OUR marker: if the lease was broken and re-claimed, the
    // marker on disk carries the usurper's token — leave it alone
    if (mine != null && readToken(fs, logDir, name).forall(_ == mine))
      fs.delete(marker(logDir, name), false)
  }

  override def claimAgeMs(fs: FileSystem, logDir: Path, name: String): Option[Long] =
    try Some(System.currentTimeMillis() -
      fs.getFileStatus(marker(logDir, name)).getModificationTime)
    catch { case _: java.io.IOException => None }

  override def breakClaim(fs: FileSystem, logDir: Path, name: String): Unit = {
    fs.delete(marker(logDir, name), false); ()
  }

  override def stillHeld(fs: FileSystem, logDir: Path, name: String): Boolean =
    tokens.get(key(logDir, name)) match {
      case null => false
      case mine => readToken(fs, logDir, name).contains(mine)
    }
}

object LogStore {
  val ConfKey = "spark.graft.logStore.class"

  /** Claim lease TTL in ms (default 10 min — claims are held for
    * milliseconds in healthy commits, so age past this is decisively a
    * crashed writer). `<= 0` disables lease-breaking entirely. */
  val ClaimTtlKey = "spark.graft.logStore.claimTtlMs"
  val DefaultClaimTtlMs: Long = 10L * 60 * 1000

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
