package graft.tables

import java.nio.file.Files
import java.sql.SQLException

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** Arbiter-database OUTAGE semantics ([[JdbcArbiterLogStore]]): the store
  * must REFUSE commits while the database is unreachable (never degrade to
  * non-atomic claims), leave the table bit-for-bit consistent, keep reads
  * serving (reads never touch the arbiter), heal its cached connection
  * when the database comes back, and leak no claim past a refused commit.
  * Driven against embedded Derby — the same JDBC surface a Postgres/MySQL
  * deployment exercises — by shutting the Derby database down mid-sequence
  * (a real engine restart: every open connection dies) and by pointing the
  * config at an unreachable URL (a real network outage). */
class JdbcArbiterOutageSpec extends SparkSpecBase {
  import spark.implicits._

  // set on BOTH conf surfaces Config(fs) consults: the cached FileSystem's
  // conf may be a snapshot that captured an earlier value of this key, and
  // per-filesystem overrides take precedence over the live session conf —
  // in production the URL is fixed at launch; this test switches it
  // mid-session to simulate the outage
  private def setUrl(url: String): Unit = {
    spark.sparkContext.hadoopConfiguration.set(JdbcArbiterLogStore.UrlKey, url)
    graft.lake.FsUtils.fs(spark, "/tmp").getConf
      .set(JdbcArbiterLogStore.UrlKey, url)
  }

  test("commits fail loudly during an outage, heal after it, and leak no claim") {
    val root = Files.createTempDirectory("graft-arbiter-outage-").toString
    val db = s"$root/claims"
    val goodUrl = s"jdbc:derby:$db;create=true"
    setUrl(goodUrl)
    spark.conf.set(LogStore.ConfKey, classOf[JdbcArbiterLogStore].getName)
    try {
      val t = GraftTable(spark, s"$root/t")(GraftSettings.default)
      t.append(Seq((1, "a")).toDF("id", "v")) // healthy commit through the arbiter

      // --- database RESTART: shut the Derby db down; every cached
      // connection in the JVM dies (Derby reports the successful shutdown
      // as SQLState 08006 — the exception IS the success signal)
      intercept[SQLException](
        java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true"))
      // the commit path must HEAL: withConn either observes the cached
      // connection closed and reopens inline (Derby re-boots the db), or
      // surfaces ONE loud failure while evicting the dead handle — the
      // documented contract is "heals on the next call", so at most one
      // retry lands. Never a silent degrade, never a lost commit.
      try t.append(Seq((2, "b")).toDF("id", "v"))
      catch { case _: Exception => t.append(Seq((2, "b")).toDF("id", "v")) }
      assert(t.version === 2)

      // --- network OUTAGE: the arbiter is unreachable (no ;create — the
      // connect itself fails). A commit must fail LOUDLY rather than
      // degrade to non-atomic claims...
      setUrl(s"jdbc:derby:$root/no-such-db-here")
      val e = intercept[Exception](t.append(Seq((3, "c")).toDF("id", "v")))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => s"${m.getClass.getName}: ${m.getMessage}").mkString(" | ")
      assert(msgs.nonEmpty, "outage must surface as an exception")
      // ...the table stays consistent (the refused commit left no trace)...
      assert(t.version === 2, "a refused commit must not advance the log")
      // ...and READS keep serving — they never touch the arbiter
      assert(t.read().count() === 2)

      // --- recovery: the database is reachable again; commits proceed
      setUrl(goodUrl)
      t.append(Seq((3, "c")).toDF("id", "v"))
      assert(t.version === 3)
      assert(t.read().count() === 3)
      // no claim leaked past the sequence: every published version's
      // claim row was released (or never written), so a fresh handle can
      // claim any of those names again
      val fs = graft.lake.FsUtils.fs(spark, t.path)
      val logDir = new org.apache.hadoop.fs.Path(s"${t.path}/_graft_log")
      val fresh = new JdbcArbiterLogStore
      (1 to 3).foreach { v =>
        val name = "%020d.json".format(v)
        assert(fresh.tryClaim(fs, logDir, name),
          s"claim row for v$v leaked past its commit")
        fresh.release(fs, logDir, name)
      }
    } finally {
      spark.conf.unset(LogStore.ConfKey)
      spark.sparkContext.hadoopConfiguration.unset(JdbcArbiterLogStore.UrlKey)
      graft.lake.FsUtils.fs(spark, "/tmp").getConf
        .unset(JdbcArbiterLogStore.UrlKey)
    }
  }

  // --- dialect probe under a transient failure ------------------------------

  /** A [[java.sql.Connection]] stub whose metadata either throws (the
    * probe ran exactly as the connection dropped) or reports a product
    * name — only the two methods the dialect probe touches are real. */
  private def stubConn(product: () => String): java.sql.Connection = {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    val meta = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.DatabaseMetaData]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
          if (m.getName == "getDatabaseProductName") product()
          else sys.error(s"unexpected metadata call ${m.getName}")
      })
    Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef =
          if (m.getName == "getMetaData") meta
          else sys.error(s"unexpected connection call ${m.getName}")
      }).asInstanceOf[java.sql.Connection]
  }

  test("a dialect probe that throws propagates (never a client-clock fallback) and is NOT cached") {
    // unique URL per run: the memo is JVM-wide
    val cfg = JdbcArbiterLogStore.Config(
      s"jdbc:fakepg://probe-${System.nanoTime()}", None, None, "t")
    val dying = stubConn(() => throw new SQLException("connection reset"))
    val healthy = stubConn(() => "PostgreSQL")
    // transient probe failure: the call fails LOUDLY — silently binding the
    // client clock would let a claim be STORED in one clock domain and AGED
    // in the other, corrupting the lease by the full client-DB skew
    val e = intercept[SQLException](JdbcArbiterLogStore.dbNowMsExpr(cfg, dying))
    assert(e.getMessage.contains("refusing a client-clock fallback"),
      s"error must explain the refusal, got: ${e.getMessage}")
    // the healed connection re-probes and lands the DB-clock expression —
    // a cached failure would downgrade or dead-end Postgres leases for the
    // rest of the JVM
    val healed = JdbcArbiterLogStore.dbNowMsExpr(cfg, healthy)
    assert(healed.exists(_.contains("EXTRACT(EPOCH")),
      s"healed probe must yield the Postgres epoch expression, got $healed")
    // and the SUCCESS is memoized: a later transient failure rides the hit
    assert(JdbcArbiterLogStore.dbNowMsExpr(cfg, dying) === healed)
  }
}
