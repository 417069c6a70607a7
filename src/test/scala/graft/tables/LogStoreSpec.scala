package graft.tables

import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.col

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** In-memory [[LogStore]] with CORRECT atomicity (putIfAbsent arbiter —
  * the shape an S3 DynamoDB-backed store has) that deliberately MAXIMIZES
  * collisions: claimers rendezvous on a barrier so two concurrent writers
  * attempt the same version at the same instant, instead of racing past
  * each other by luck. What the spec proves is that the protocol's
  * atomicity lives entirely behind the seam — swap the store, keep the
  * one-winner/loser-retries behavior. */
final class RacingMemoryLogStore extends LogStore {
  import RacingMemoryLogStore._
  override def tryClaim(fs: FileSystem, logDir: Path, name: String): Boolean = {
    // wait for a second contender; alone (the other writer finished, or
    // its stage is slow this run), time out and proceed. The window must
    // dwarf per-append jitter or two writers can serialize by LUCK and
    // the collision this spec exists to manufacture never happens.
    try gate.await(1500, TimeUnit.MILLISECONDS)
    catch { case _: Exception => gate.reset() }
    val won = claims.putIfAbsent(s"$logDir/$name", "") == null
    if (!won) collisions.incrementAndGet()
    won
  }
  override def release(fs: FileSystem, logDir: Path, name: String): Unit = {
    claims.remove(s"$logDir/$name"); ()
  }
}
object RacingMemoryLogStore {
  val claims = new ConcurrentHashMap[String, String]()
  val collisions = new AtomicInteger(0)
  val gate = new CyclicBarrier(2)
}

/** Simulates FSCK/lease-break clearing a winner's claim between its
  * write-temp and its publish rename: wins the claim, then reports it
  * lost at the pre-publish re-verify. */
final class UsurpedLogStore extends LogStore {
  override def tryClaim(fs: FileSystem, logDir: Path, name: String): Boolean = true
  override def release(fs: FileSystem, logDir: Path, name: String): Unit = ()
  override def stillHeld(fs: FileSystem, logDir: Path, name: String): Boolean = false
}

/** Release always fails (an arbiter-store DB blip AFTER the publish):
  * the commit's outcome must stand — masking a durable publish as an
  * exception makes a retrying caller double-append. */
final class ReleaseThrowsLogStore extends HadoopOExclLogStore {
  override def release(fs: FileSystem, logDir: Path, name: String): Unit =
    throw new RuntimeException("claims database unreachable")
}

/** Pins the claim-window/checkpoint ordering: at [[release]] time the
  * version's checkpoint files must NOT exist yet (the checkpoint write
  * runs after the claim is released, outside the window FSCK/lease
  * recovery measures). */
final class CheckpointOrderLogStore extends HadoopOExclLogStore {
  override def release(fs: FileSystem, logDir: Path, name: String): Unit = {
    val version = name.stripSuffix(".json")
    Seq(s"$version.checkpoint.parquet", s"$version.checkpoint.json").foreach { ck =>
      if (fs.exists(new Path(logDir, ck)))
        CheckpointOrderLogStore.violations.add(ck)
    }
    super.release(fs, logDir, name)
  }
}
object CheckpointOrderLogStore {
  val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** The commit-claim atomicity seam ([[LogStore]], Delta's pluggable
  * LogStore): the O_EXCL default serves local fs/HDFS; object stores plug
  * a conditional-PUT/arbiter store via `spark.graft.logStore.class`. */
class LogStoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("default store is the O_EXCL impl; misconfiguration fails loudly") {
    assert(LogStore.forSession(spark).isInstanceOf[HadoopOExclLogStore])
    spark.conf.set(LogStore.ConfKey, "java.lang.String")
    try intercept[Exception](LogStore.forSession(spark))
    finally spark.conf.unset(LogStore.ConfKey)
  }

  test("claim collision through a racing fake store: one winner, loser retries, nothing lost") {
    val dir = Files.createTempDirectory("graft-logstore-").toString
    spark.conf.set(LogStore.ConfKey, classOf[RacingMemoryLogStore].getName)
    try {
      val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      t.append(Seq((0, "seed")).toDF("id", "v"))
      RacingMemoryLogStore.collisions.set(0)
      // two writer threads, each its own table HANDLE (separate listing
      // caches — a real multi-writer), appending interleaved batches; the
      // fake store's barrier forces them to contend for the same version
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { w =>
        new Thread(() => {
          try {
            val mine = GraftTable(spark, s"$dir/t")(GraftSettings.default)
            (1 to 3).foreach { i =>
              mine.append(Seq((w * 100 + i, s"w$w-$i")).toDF("id", "v"))
            }
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.getMessage)}")
      val t2 = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      // every batch landed exactly once, versions dense 1..7
      assert(t2.read().select("id").as[Int].collect().sorted.toSeq
        === (Seq(0) ++ (1 to 3).flatMap(i => Seq(100 + i, 200 + i))).sorted)
      assert(t2.version === 7)
      assert(t2.commits().map(_.version) === (1L to 7L))
      // the barrier really manufactured same-version contention: at least
      // one claim was LOST and recovered by retry (not just serialized)
      assert(RacingMemoryLogStore.collisions.get() > 0,
        "no claim collision occurred — the race the spec exists for never happened")
    } finally spark.conf.unset(LogStore.ConfKey)
  }

  test("FSCK clears a crashed writer's stale claim; fresh claims are kept") {
    val dir = Files.createTempDirectory("graft-claim-").toString
    val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
    t.append(Seq((1, "a")).toDF("id", "v"))
    val fs = graft.lake.FsUtils.fs(spark, t.path)
    val logDir = new Path(s"${t.path}/_graft_log")
    // a crashed writer's leftover claim, artificially aged past 10 min
    val stale = new Path(logDir, s".${"%020d".format(2)}.json.claim")
    fs.create(stale, false).close()
    fs.setTimes(stale, System.currentTimeMillis() - 11 * 60 * 1000, -1)
    // a LIVE writer's fresh claim must survive (age is the staleness test)
    val fresh = new Path(logDir, s".${"%020d".format(3)}.json.claim")
    fs.create(fresh, false).close()
    // a crashed writer's never-renamed write-temp, also aged stale
    val tmpLeft = new Path(logDir, s".${"%020d".format(2)}.json.deadbeef.tmp")
    fs.create(tmpLeft, false).close()
    fs.setTimes(tmpLeft, System.currentTimeMillis() - 11 * 60 * 1000, -1)
    val report = t.repair(dryRun = true)
    assert(report.exists(_.endsWith(".claim")), s"dry run must report the stale claim: $report")
    assert(report.exists(_.endsWith(".tmp")), s"dry run must report the stale temp: $report")
    t.repair(dryRun = false)
    assert(!fs.exists(stale), "stale claim must be cleared")
    assert(!fs.exists(tmpLeft), "stale write-temp must be cleared")
    assert(fs.exists(fresh), "fresh claim must be kept")
    fs.delete(fresh, false)
    // the unblocked version commits normally again
    t.append(Seq((2, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
  }

  test("a crashed winner's expired claim is broken inline: the next writer lands WITHOUT FSCK") {
    val dir = Files.createTempDirectory("graft-lease-").toString
    val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
    t.append(Seq((1, "a")).toDF("id", "v"))
    val fs = graft.lake.FsUtils.fs(spark, t.path)
    val logDir = new Path(s"${t.path}/_graft_log")
    // a crashed writer's leftover claim on the NEXT version, aged past TTL
    val stale = new Path(logDir, s".${"%020d".format(2)}.json.claim")
    fs.create(stale, false).close()
    fs.setTimes(stale, System.currentTimeMillis() - 11 * 60 * 1000, -1)
    // the append must break the expired lease, re-claim, and publish —
    // no repair() call anywhere
    t.append(Seq((2, "b")).toDF("id", "v"))
    assert(t.version === 2)
    assert(t.read().count() === 2)
    assert(!fs.exists(stale), "expired claim must be gone after recovery")
    // a FRESH foreign claim (live writer) still blocks: conflict, not break
    val fresh = new Path(logDir, s".${"%020d".format(3)}.json.claim")
    fs.create(fresh, false).close()
    val e = intercept[IllegalStateException](
      GraftTable(spark, s"$dir/t")(GraftSettings.default)
        .append(Seq((3, "c")).toDF("id", "v")))
    assert(e.getMessage.contains("concurrent commit"))
    assert(fs.exists(fresh), "a live writer's fresh claim must not be broken")
    fs.delete(fresh, false)
  }

  // NOTE: the store-contract cases (one-winner barrier rounds, usurped
  // abort, witness-scoped break, publish no-overwrite, lease expiry)
  // moved to [[LogStoreTCK]], which certifies BOTH built-in stores and
  // any third-party `spark.graft.logStore.class`. This spec keeps the
  // protocol-composition cases that are not per-store contracts.

  test("usurped winner aborts end-to-end: a commit whose claim is lost mid-write publishes nothing") {
    val dir = Files.createTempDirectory("graft-usurp-").toString
    spark.conf.set(LogStore.ConfKey, classOf[UsurpedLogStore].getName)
    try {
      val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      val e = intercept[IllegalStateException](
        t.append(Seq((1, "a")).toDF("id", "v")))
      assert(e.getMessage.contains("concurrent commit"))
      assert(!t.exists, "an aborted commit must not publish a version file")
    } finally spark.conf.unset(LogStore.ConfKey)
  }

  test("a release failure after publish never masks the commit outcome") {
    val dir = Files.createTempDirectory("graft-release-fail-").toString
    spark.conf.set(LogStore.ConfKey, classOf[ReleaseThrowsLogStore].getName)
    try {
      val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      // the release throws AFTER the publish rename: the append must
      // still report success — the commit is durably in the log
      t.append(Seq((1, "a")).toDF("id", "v"))
      assert(t.version === 1)
      assert(t.read().count() === 1)
      // and the handle's own listing reflects its published commit
      // (invalidateListing must run even when release throws)
      assert(t.commits().map(_.version) === Seq(1L))
    } finally spark.conf.unset(LogStore.ConfKey)
  }

  test("micro-bench: claim acquire/release — O_EXCL vs JDBC arbiter") {
    // not a perf ASSERTION (CI noise): prints per-claim cost for the
    // record — the arbiter's conditional INSERT must be commit-noise
    // (~ms) next to the staging/commit work it guards. The pinned
    // invariant is contract parity: both stores serve N sequential
    // claim/release cycles with identical observable behavior.
    val dir = Files.createTempDirectory("graft-claim-bench-").toString
    val fs = graft.lake.FsUtils.fs(spark, dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    spark.sparkContext.hadoopConfiguration.set(JdbcArbiterLogStore.UrlKey,
      s"jdbc:derby:$dir/claimdb;create=true")
    val stores: Seq[(String, LogStore)] = Seq(
      "HadoopOExcl" -> new HadoopOExclLogStore,
      "JdbcArbiter(derby)" -> new JdbcArbiterLogStore)
    stores.foreach { case (name, s) =>
      (1 to 10).foreach { i => // warmup (connection open, JIT)
        assert(s.tryClaim(fs, logDir, s"w-$name-$i.json"))
        s.release(fs, logDir, s"w-$name-$i.json")
      }
      val n = 200
      val t0 = System.nanoTime()
      (1 to n).foreach { i =>
        assert(s.tryClaim(fs, logDir, s"b-$name-$i.json"), s"$name claim $i lost")
        s.release(fs, logDir, s"b-$name-$i.json")
      }
      val msPer = (System.nanoTime() - t0) / 1e6 / n
      info(f"[claim-bench] $name: $msPer%.3f ms per claim+release over $n cycles")
      // a released name is claimable again — the cycle really released
      assert(s.tryClaim(fs, logDir, s"b-$name-1.json"))
      s.release(fs, logDir, s"b-$name-1.json")
    }
  }

  test("publish on a link-less mount REFUSES by default; opt-in degrades with a WARN") {
    val dir = Files.createTempDirectory("graft-degrade-").toString
    val fs = graft.lake.FsUtils.fs(spark, dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    // a mount that refuses hard links (FUSE/NFS): the exists+rename
    // fallback is check-then-act (a dual-holder window could LOSE a
    // commit), so by DEFAULT the publish must fail loudly with the
    // arbiter remedy — an operator opts into the window consciously
    val linkless = new HadoopOExclLogStore {
      override protected def hardLink(link: java.nio.file.Path,
          existing: java.nio.file.Path): Unit =
        throw new UnsupportedOperationException("no links on this mount")
    }
    val tmp = new Path(logDir, ".2.a.tmp")
    val out = fs.create(tmp, false)
    try out.write("commit".getBytes("UTF-8")) finally out.close()
    val dst = new Path(logDir, "00000000000000000002.json")
    val refused = intercept[IllegalStateException](linkless.publish(fs, tmp, dst))
    assert(refused.getMessage.contains(classOf[JdbcArbiterLogStore].getName),
      s"refusal must recommend an arbiter store: ${refused.getMessage}")
    assert(refused.getMessage.contains(LogStore.AllowNonAtomicPublishKey),
      s"refusal must name the opt-in conf: ${refused.getMessage}")
    assert(!fs.exists(dst), "a refused publish must not publish")

    // opted in: the degrade publishes (healthy writers stay serialized by
    // the claim), and the lost no-overwrite guarantee is WARNED
    spark.conf.set(LogStore.AllowNonAtomicPublishKey, "true")
    try {
      LogStore.lastPublishDegradeWarning = null
      assert(linkless.publish(fs, tmp, dst), "opted-in degrade must publish")
      assert(fs.exists(dst))
      val warning = LogStore.lastPublishDegradeWarning
      assert(warning != null, "degrade must emit the operator warning")
      assert(warning.contains(dst.toString), s"warning must name the path: $warning")
      assert(warning.contains(classOf[JdbcArbiterLogStore].getName),
        s"warning must recommend an arbiter store: $warning")
      // and an existing destination still refuses (no silent overwrite)
      val tmp2 = new Path(logDir, ".2.b.tmp")
      val out2 = fs.create(tmp2, false)
      try out2.write("second".getBytes("UTF-8")) finally out2.close()
      assert(!linkless.publish(fs, tmp2, dst))
    } finally spark.conf.unset(LogStore.AllowNonAtomicPublishKey)
  }

  test("claim is released BEFORE the checkpoint write (FSCK can never clear a live writer mid-checkpoint)") {
    val dir = Files.createTempDirectory("graft-ckptclaim-").toString
    spark.conf.set(LogStore.ConfKey, classOf[CheckpointOrderLogStore].getName)
    try {
      // checkpoint every commit: if the parquet/json checkpoint were
      // written INSIDE the claim window, release() would observe the
      // checkpoint file already on disk and flag it
      val t = GraftTable(spark, s"$dir/t")(
        GraftSettings.default.copy(logCheckpointInterval = 1))
      (1 to 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
      assert(CheckpointOrderLogStore.violations.isEmpty,
        s"checkpoint written under the commit claim: ${CheckpointOrderLogStore.violations}")
      assert(t.read().count() === 3)
    } finally spark.conf.unset(LogStore.ConfKey)
  }

}
