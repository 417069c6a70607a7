package graft.tables

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** The [[LogStore]] certification kit (TCK): every case below is a clause
  * of the trait's contract, expressed ONLY through the trait — no
  * implementation detail — so ANY store class can be certified by
  * extending this suite and answering two questions: what class name goes
  * in `spark.graft.logStore.class`, and how does a FRESH PROCESS's handle
  * look (a new instance with no in-memory claim state). The built-in
  * stores each ship a concrete suite ([[HadoopOExclLogStoreTCK]],
  * [[JdbcArbiterLogStoreTCK]]); a deployment certifying its own store
  * (a DynamoDB arbiter, a different database) extends this the same way.
  *
  * Time-based cases use REAL elapsed time against a tiny TTL instead of
  * mutating store internals, so they hold for stores whose lease clock the
  * test cannot reach (a remote database's rows, an object store's mtime).
  */
abstract class LogStoreTCK extends SparkSpecBase {
  import spark.implicits._

  /** Class name to certify — what a session sets in
    * `spark.graft.logStore.class`. */
  def storeClassName: String

  /** A new handle with NO in-memory claim state — how the store looks to
    * another process (or to the same process after a crash/restart). */
  def newProcessStore(): LogStore

  /** One-time environment setup (e.g. pointing the arbiter at its
    * database) — runs before the first store is constructed. */
  def prepare(): Unit = ()

  private lazy val ready: Unit = prepare()
  private def store(): LogStore = { ready; newProcessStore() }
  private def fsFor(dir: String) = graft.lake.FsUtils.fs(spark, dir)
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def shortName = storeClassName.split('.').last

  test(s"[$shortName] exactly one winner per (logDir, name), across processes, 50 barrier rounds") {
    val dir = tmp("graft-tck-claim-")
    val fs = fsFor(dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    // four DISTINCT handles = four processes; the barrier maximizes the
    // chance all four hit the arbiter in the same instant
    val stores = (1 to 4).map(_ => store())
    (1 to 50).foreach { round =>
      val gate = new CyclicBarrier(stores.size)
      val wins = new AtomicInteger(0)
      val winner = new java.util.concurrent.atomic.AtomicReference[LogStore]()
      val threads = stores.map(s => new Thread(() => {
        gate.await()
        if (s.tryClaim(fs, logDir, s"v$round.json")) {
          wins.incrementAndGet(); winner.set(s)
        }
        ()
      }))
      threads.foreach(_.start()); threads.foreach(_.join(10000))
      assert(wins.get() === 1, s"round $round: ${wins.get()} claim winners")
      // release frees the name for the next claimant
      winner.get().release(fs, logDir, s"v$round.json")
      val next = store()
      assert(next.tryClaim(fs, logDir, s"v$round.json"),
        "released claim must be claimable again")
      next.release(fs, logDir, s"v$round.json")
    }
  }

  test(s"[$shortName] witness/lease protocol: usurped holder aborts, foreign claims survive release") {
    val dir = tmp("graft-tck-usurp-")
    val fs = fsFor(dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    val a = store()
    val b = store()
    assert(a.tryClaim(fs, logDir, "v.json"))
    assert(a.stillHeld(fs, logDir, "v.json"))
    // B observes A's claim and breaks it with the witness it read
    val witness = b.claimWitness(fs, logDir, "v.json")
    b.breakClaim(fs, logDir, "v.json", witness)
    assert(b.tryClaim(fs, logDir, "v.json"), "broken claim must be claimable")
    // A must observe the usurpation; B must hold
    assert(!a.stillHeld(fs, logDir, "v.json"),
      "usurped holder must see its claim as lost (pre-publish abort)")
    assert(b.stillHeld(fs, logDir, "v.json"))
    // A's release must not disturb B's claim
    a.release(fs, logDir, "v.json")
    assert(b.stillHeld(fs, logDir, "v.json"),
      "the loser's release deleted the usurper's claim")
    b.release(fs, logDir, "v.json")
    assert(store().tryClaim(fs, logDir, "v.json"))
  }

  test(s"[$shortName] a break is scoped to its witness: racing breakers cannot mint two holders") {
    val dir = tmp("graft-tck-breakrace-")
    val fs = fsFor(dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    val crashed = store()
    val a = store()
    val b = store()
    assert(crashed.tryClaim(fs, logDir, "v.json")) // never releases
    val witnessA = a.claimWitness(fs, logDir, "v.json")
    val witnessB = b.claimWitness(fs, logDir, "v.json")
    a.breakClaim(fs, logDir, "v.json", witnessA)
    assert(a.tryClaim(fs, logDir, "v.json"))
    // B's break carries the CRASHED claim's identity: it must refuse to
    // delete A's fresh re-claim
    b.breakClaim(fs, logDir, "v.json", witnessB)
    assert(!b.tryClaim(fs, logDir, "v.json"),
      "a stale-witness break deleted a fresh re-claim — two holders")
    assert(a.stillHeld(fs, logDir, "v.json"))
    a.release(fs, logDir, "v.json")
  }

  test(s"[$shortName] expired lease is observable and breakable; a fresh claim is not") {
    val dir = tmp("graft-tck-lease-")
    val fs = fsFor(dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    val crashed = store()
    assert(crashed.tryClaim(fs, logDir, "v.json")) // crash: never releases
    val contender = store()
    // REAL elapsed time, no internals: after 150ms the claim's age must
    // read at least ~100ms (allowing coarse store clocks)
    Thread.sleep(150)
    val age = contender.claimAgeMs(fs, logDir, "v.json")
    assert(age.exists(_ >= 100), s"claim age unobservable or too small: $age")
    val witness = contender.claimWitness(fs, logDir, "v.json")
    assert(witness.isDefined, "a held claim must have an observable identity")
    contender.breakClaim(fs, logDir, "v.json", witness)
    assert(contender.tryClaim(fs, logDir, "v.json"))
    assert(contender.stillHeld(fs, logDir, "v.json"))
    contender.release(fs, logDir, "v.json")
  }

  test(s"[$shortName] publish is atomic no-overwrite") {
    val dir = tmp("graft-tck-publish-")
    val fs = fsFor(dir)
    val logDir = new Path(s"$dir/log")
    fs.mkdirs(logDir)
    val s = store()
    def writeTmp(name: String, content: String): Path = {
      val p = new Path(logDir, name)
      val out = fs.create(p, false)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      p
    }
    val dst = new Path(logDir, "00000000000000000002.json")
    assert(s.publish(fs, writeTmp(".2.a.tmp", "first-commit"), dst))
    assert(!s.publish(fs, writeTmp(".2.b.tmp", "second-commit"), dst),
      "second publish of the same version must fail, not overwrite")
    val in = fs.open(dst)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") === "first-commit")
  }

  test(s"[$shortName] end-to-end: contended multi-writer commits keep the log dense") {
    ready
    val dir = tmp("graft-tck-e2e-")
    spark.conf.set(LogStore.ConfKey, storeClassName)
    try {
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
    } finally spark.conf.unset(LogStore.ConfKey)
  }

  test(s"[$shortName] end-to-end: a crashed writer's expired claim recovers inline (no FSCK)") {
    ready
    val dir = tmp("graft-tck-ttl-")
    spark.conf.set(LogStore.ConfKey, storeClassName)
    try {
      val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      t.append(Seq((1, "a")).toDF("id", "v"))
      // a crashed writer claims the NEXT version and dies (fresh handle,
      // never released) — REAL time vs a 100ms TTL, portable to any store
      val fs = fsFor(t.path)
      val logDir = new Path(s"${t.path}/_graft_log")
      assert(store().tryClaim(fs, logDir, s"${"%020d".format(2)}.json"))
      // while FRESH, a contender conflicts rather than breaking
      val e = intercept[IllegalStateException](
        GraftTable(spark, s"$dir/t")(GraftSettings.default)
          .append(Seq((9, "x")).toDF("id", "v")))
      assert(e.getMessage.contains("concurrent commit"))
      // past the TTL, the same append breaks the lease inline and lands
      spark.conf.set(LogStore.ClaimTtlKey, "100")
      try {
        Thread.sleep(200)
        t.append(Seq((2, "b")).toDF("id", "v"))
        assert(t.version === 2)
        assert(t.read().select("id").as[Int].collect().sorted.toSeq === Seq(1, 2))
      } finally spark.conf.unset(LogStore.ClaimTtlKey)
    } finally spark.conf.unset(LogStore.ConfKey)
  }
  test(s"[$shortName] end-to-end: a writer that dies BETWEEN stage and publish recovers (lease break wins the version; FSCK reaps the orphan tmp)") {
    ready
    val dir = tmp("graft-tck-crashpub-")
    spark.conf.set(LogStore.ConfKey, storeClassName)
    try {
      val t = GraftTable(spark, s"$dir/t")(GraftSettings.default)
      t.append(Seq((1, "a")).toDF("id", "v"))
      val fs = fsFor(t.path)
      val logDir = new Path(s"${t.path}/_graft_log")
      val name = "%020d.json".format(2)
      // the crashed writer: wins the claim, STAGES its commit body (the
      // .tmp the publish rename would have consumed), and dies between
      // the stillHeld re-verify and the publish — claim outstanding, tmp
      // orphaned, version file absent
      assert(store().tryClaim(fs, logDir, name))
      val orphan = new Path(logDir, s".$name.deadbeef.tmp")
      val out = fs.create(orphan, false)
      try out.write("""{"version":2,"never":"published"}""".getBytes("UTF-8"))
      finally out.close()
      spark.conf.set(LogStore.ClaimTtlKey, "100")
      try {
        Thread.sleep(200)
        // the next contender must break the expired lease inline,
        // re-claim, and publish its OWN commit at that version — the dead
        // writer's staged body must never surface as v2's content
        t.append(Seq((2, "b")).toDF("id", "v"))
        assert(t.version === 2)
        assert(t.read().select("id").as[Int].collect().sorted.toSeq === Seq(1, 2))
        assert(t.commits().last.add.nonEmpty,
          "v2 must be the live contender's commit, not the dead writer's body")
        // the orphan tmp is invisible to every reader; FSCK reports it in
        // dryRun (aged past the same TTL the lease honors) and reaps it
        assert(fs.exists(orphan), "precondition: orphan staged body present")
        val reported = t.repair(dryRun = true)
        assert(reported.exists(_.contains(orphan.getName)),
          s"FSCK must report the orphan tmp: $reported")
        t.repair(dryRun = false)
        assert(!fs.exists(orphan), "FSCK must reap the orphan staged body")
        // and the table keeps committing normally afterwards
        t.append(Seq((3, "c")).toDF("id", "v"))
        assert(t.read().count() === 3)
      } finally spark.conf.unset(LogStore.ClaimTtlKey)
    } finally spark.conf.unset(LogStore.ConfKey)
  }
}

/** Certifies the O_EXCL default ([[HadoopOExclLogStore]]). */
class HadoopOExclLogStoreTCK extends LogStoreTCK {
  override def storeClassName: String = classOf[HadoopOExclLogStore].getName
  override def newProcessStore(): LogStore = new HadoopOExclLogStore
}

/** Certifies the deployable JDBC arbiter ([[JdbcArbiterLogStore]]) against
  * embedded Derby — the same conditional-INSERT SQL a Postgres/MySQL
  * deployment runs, driven fully in-process. */
class JdbcArbiterLogStoreTCK extends LogStoreTCK {
  override def storeClassName: String = classOf[JdbcArbiterLogStore].getName
  override def newProcessStore(): LogStore = new JdbcArbiterLogStore
  override def prepare(): Unit = {
    val db = Files.createTempDirectory("graft-tck-derby-").toString
    spark.sparkContext.hadoopConfiguration.set(
      JdbcArbiterLogStore.UrlKey, s"jdbc:derby:$db/claims;create=true")
  }
}
