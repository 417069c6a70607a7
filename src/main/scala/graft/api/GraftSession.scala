package graft.api

import org.apache.spark.sql.SparkSession

/** Session bootstrap mirroring the reference's version-dispatching builder
  * (`jibaro/spark/session.py:124-134`): one entry point that lands on
  * either a classic (local/cluster) session or a Spark Connect session
  * depending on environment — `SPARK_REMOTE` set ⇒ Connect
  * (`session.py:67-122`), otherwise classic (`session.py:39-65`).
  *
  * The reference needs 80 lines of subclass surgery because PySpark 3.3/3.4
  * split the two session types; on Spark 4 the `SparkSession` API is
  * unified and `builder.remote(url)` IS the dispatch — so this helper is
  * deliberately thin: resolve the endpoint, apply library defaults, hand
  * back the standard builder. No subclass, nothing to keep in sync with
  * Spark upgrades.
  */
object GraftSession {

  /** Connect endpoint resolution, reference-order: explicit argument wins,
    * then the `SPARK_REMOTE` environment variable (the same variable the
    * stock `pyspark` launcher and the reference both honor); blank means
    * unset. Factored over an env MAP so the dispatch is unit-testable
    * without mutating the process environment. */
  def remoteEndpoint(
      explicit: Option[String] = None,
      env: Map[String, String] = sys.env): Option[String] =
    explicit.orElse(env.get("SPARK_REMOTE")).map(_.trim).filter(_.nonEmpty)

  /** Library-default session confs — the knobs every graft session wants
    * regardless of deployment (the reference bakes its equivalents into
    * `tests_scripts/spark.properties:1-9`). Callers override freely; the
    * shuffle-partition default is sized by the caller's cluster, not here. */
  val Defaults: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true")

  /** Guard for surfaces that CANNOT run over a Spark Connect session —
    * anything needing the driver's SparkContext (the table/lake API's
    * filesystem + commit-log access). Connect sessions are a separate
    * implementation class (`org.apache.spark.sql.connect.*`) of the
    * unified Spark 4 `SparkSession`, so the class NAME is the dispatch;
    * without this guard the failure is an opaque
    * "sparkContext is not supported" deep inside a read. The SQL surface
    * (DML, maintenance statements, `graft_*` functions, `format("graft")`)
    * works over Connect when the SERVER session carries the graft jar
    * and `spark.sql.extensions=graft.GraftExtensions` — see the README's
    * Connect matrix. */
  def requireClassic(sessionClassName: String, what: String): Unit =
    if (sessionClassName.startsWith("org.apache.spark.sql.connect."))
      throw new UnsupportedOperationException(
        s"$what needs a CLASSIC SparkSession and cannot run over Spark " +
          "Connect: the client has no SparkContext. Run this code on the " +
          "server/driver side, or use the SQL surface (DELETE/UPDATE/" +
          "MERGE INTO, VACUUM/OPTIMIZE/..., graft_* functions, " +
          "spark.read.format(\"graft\")) against a Connect server whose " +
          "session was created with the graft jar and " +
          "spark.sql.extensions=graft.GraftExtensions")

  /** A builder pre-wired with [[Defaults]] and the Connect/classic
    * dispatch. `remote` argument > `SPARK_REMOTE` env > classic. Call
    * `.master(...)`/`.config(...)` on the result as usual, then
    * `.getOrCreate()`. */
  def builder(
      appName: String = "graft",
      remote: Option[String] = None,
      env: Map[String, String] = sys.env): SparkSession.Builder = {
    val base = SparkSession.builder().appName(appName)
    val withDefaults =
      Defaults.foldLeft(base) { case (b, (k, v)) => b.config(k, v) }
    remoteEndpoint(remote, env) match {
      case Some(url) => withDefaults.remote(url)
      case None      => withDefaults
    }
  }
}
