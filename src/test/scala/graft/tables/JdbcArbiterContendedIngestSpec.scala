package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.conf.GraftSettings

/** End-to-end CONTENDED multi-writer ingest through the JDBC arbiter: the
  * TCK proves the claim contract in isolation (50 barrier rounds, 4
  * handles); this drives the whole stack — two REAL concurrent streaming
  * queries, each committing dozens of micro-batches to ONE table through
  * the Derby arbiter — and asserts the end state a production multi-writer
  * deployment depends on: zero lost commits, a dense version chain, both
  * queries' (queryKey, batchId) exactly-once stamps present and dense, and
  * no claim row leaked after both drain. */
class JdbcArbiterContendedIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val BatchesPerWriter = 25

  test("two concurrent streaming ingests interleave dozens of micro-batch commits losslessly") {
    val root = Files.createTempDirectory("graft-contended-").toString
    val dbUrl = s"jdbc:derby:$root/claims;create=true"
    // both conf surfaces Config(fs) consults (see JdbcArbiterOutageSpec)
    spark.sparkContext.hadoopConfiguration.set(JdbcArbiterLogStore.UrlKey, dbUrl)
    graft.lake.FsUtils.fs(spark, "/tmp").getConf
      .set(JdbcArbiterLogStore.UrlKey, dbUrl)
    spark.conf.set(LogStore.ConfKey, classOf[JdbcArbiterLogStore].getName)
    try {
      val dest = s"$root/dest"
      // each source preloads one single-file commit per intended
      // micro-batch; maxFilesPerTrigger=1 then admits exactly one per
      // trigger, so each query replays as ~BatchesPerWriter micro-batches
      def preload(name: String, writer: String): String = {
        val p = s"$root/$name"
        val t = GraftTable(spark, p)(GraftSettings.default)
        (1 to BatchesPerWriter).foreach(i =>
          t.append(Seq((i, writer)).toDF("n", "writer").repartition(1)))
        p
      }
      val src1 = preload("src1", "w1")
      val src2 = preload("src2", "w2")

      def start(src: String, ck: String) =
        spark.readStream.format("graft")
          .option("maxFilesPerTrigger", "1").load(src)
          .writeStream.format("graft")
          .option("checkpointLocation", s"$root/$ck")
          .trigger(Trigger.AvailableNow())
          .start(dest)
      // started back-to-back: every micro-batch append of one query
      // contends with the other's on the SAME table's arbiter claims
      val q1 = start(src1, "ck1")
      val q2 = start(src2, "ck2")
      q1.awaitTermination()
      q2.awaitTermination()

      val t = GraftTable(spark, dest)(GraftSettings.default)
      // zero lost commits: every preloaded row landed exactly once
      val byWriter = t.read().groupBy("writer").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byWriter === Map(
        "w1" -> BatchesPerWriter.toLong, "w2" -> BatchesPerWriter.toLong),
        s"lost or duplicated commits: $byWriter")

      // dense version chain: no version skipped or silently overwritten
      val versions = t.commits().map(_.version)
      assert(versions === (1L to versions.max),
        s"version chain must be dense, got $versions")

      // both queries' exactly-once stamps present, each query's batch ids
      // dense from 0 (the replay-detection key the sink dedups on)
      val stamps = t.commits()
        .flatMap(c => for {
          k <- c.metrics.get(GraftStreamSink.QueryKey)
          b <- c.metrics.get(GraftStreamSink.BatchKey)
        } yield (k, b.toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(stamps.size === 2,
        s"expected two distinct queryKeys, got ${stamps.keys}")
      stamps.foreach { case (k, ids) =>
        assert(ids === (0L until ids.length),
          s"query $k batch ids must be dense from 0, got $ids")
        assert(ids.length >= BatchesPerWriter / 2,
          s"query $k drained in ${ids.length} batches — admission control " +
            "should have split it into dozens")
      }

      // no claim row leaked past the drain
      val c = java.sql.DriverManager.getConnection(dbUrl)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT COUNT(*) FROM graft_log_claims")
        rs.next()
        assert(rs.getInt(1) === 0, "claim rows leaked after both queries drained")
      } finally c.close()
    } finally {
      spark.conf.unset(LogStore.ConfKey)
      spark.sparkContext.hadoopConfiguration.unset(JdbcArbiterLogStore.UrlKey)
      graft.lake.FsUtils.fs(spark, "/tmp").getConf
        .unset(JdbcArbiterLogStore.UrlKey)
    }
  }
}
