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
    // wait briefly for a second contender; alone, time out and proceed
    try gate.await(100, TimeUnit.MILLISECONDS)
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

  test("O_EXCL default under thread contention also keeps the log dense") {
    val dir = Files.createTempDirectory("graft-logstore-dflt-").toString
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { w =>
      new Thread(() => {
        try {
          val mine = GraftTable(spark, s"$dir/t")(GraftSettings.default)
          (1 to 3).foreach(i =>
            mine.append(Seq((w * 100 + i, s"w$w-$i")).toDF("id", "v")))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.getMessage)}")
    val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
    assert(t.read().count() === 6)
    assert(t.commits().map(_.version) === (1L to 6L))
  }
}
