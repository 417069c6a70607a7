package graft.api

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase
import graft.conf.GraftSettings
import graft.tables.GraftTable

/** The README's Spark Connect matrix, EMPIRICALLY: a real Connect server
  * (gRPC, in this JVM — the `spark-connect` jar ships in the same Spark
  * distribution) serves a real `spark-connect-client-jvm` client session.
  * Verifies both cells of the matrix:
  *
  *  - `format("graft")` reads and the injected SQL surface (graft_*
  *    table functions) WORK over Connect when the SERVER carries the
  *    graft jar and `spark.sql.extensions=graft.GraftExtensions` —
  *    everything plans server-side where the SparkContext lives;
  *  - the Scala table/lake API REFUSES the client session with the
  *    remedy matrix named ([[GraftSession.requireClassic]]), never an
  *    opaque "no SparkContext" failure mid-read.
  *
  * The client is a DIFFERENT implementation class
  * (`org.apache.spark.sql.connect.SparkSession`) of Spark 4's unified
  * `SparkSession`, so it type-checks into every API that takes a session
  * — exactly why the loud class-name guard exists. */
class GraftConnectSpec extends SparkSpecBase {
  import spark.implicits._

  private val Port = 15002 // the service's default binding

  test("Connect matrix empirically: reads/SQL serve over Connect; the Scala table API refuses the client session") {
    // the service binds its DEFAULT port (the context's SparkConf is
    // sealed, so the binding conf cannot be set post-start): skip rather
    // than fail/hang when something else already owns it (a developer's
    // local Connect server, a concurrent test JVM)
    assume(
      try {
        val probe = new java.net.ServerSocket(Port)
        probe.close(); true
      } catch { case _: java.io.IOException => false },
      s"port $Port occupied — cannot host the in-JVM Connect server")
    val root = java.nio.file.Files.createTempDirectory("graft-connect-").toString
    val t = GraftTable(spark, s"$root/t")(GraftSettings.default)
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))

    // the server jar ships in the same distribution; the service binds its
    // default gRPC port and serves sessions created SERVER-SIDE — which is
    // where the graft jar and extensions must live (a client cannot inject
    // them), exactly the documented matrix requirement
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      val client = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$Port").create()
      try {
        // format("graft") batch read over Connect: the server resolves the
        // short name via the jar's DataSourceRegister and plans the scan
        // server-side
        assert(client.read.format("graft").load(s"$root/t").count() === 3)
        assert(client.read.format("graft").load(s"$root/t")
          .filter(col("id") > 1).select("v").count() === 2)
        // the injected SQL surface over Connect: graft_history is a
        // GraftExtensions table function, resolved by the SERVER session's
        // extensions
        assert(client.sql(s"SELECT count(*) AS n FROM graft_history('$root/t')")
          .collect()(0).getLong(0) === 1L)
        // the Scala table/lake API refuses the CLIENT session, loudly and
        // with the remedy matrix (it needs the driver's SparkContext)
        val e = intercept[UnsupportedOperationException](
          GraftTable(client, s"$root/t")(GraftSettings.default).read())
        assert(e.getMessage.contains("Spark Connect"), e.getMessage)
        assert(e.getMessage.contains("format(\"graft\")"), e.getMessage)
      } finally client.close()
    } finally org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
  }
}
