package graft.streaming

import graft.SparkSpecBase
import graft.cdc.MessageBus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:10"), 1.0),
    (1L, ts("2024-01-01 10:02:10"), 2.0),
    (1L, ts("2024-01-01 11:30:00"), 3.0), // new session for key 1
    (2L, ts("2024-01-01 10:01:00"), 4.0)
  ).toDF("key", "ts", "value")

  test("windowedAgg: 5-minute tumbling counts (batch parity)") {
    val out = StreamOps.windowedAgg(events, "ts", "key", "5 minutes")
      .orderBy("window_start", "key")
      .select("key", "n", "total_value").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 3.0), (2L, 1L, 4.0), (1L, 1L, 3.0)))
  }

  test("sessionize: 30-minute gap splits sessions per key") {
    val out = StreamOps.sessionize(events, "ts", "key", gap = "30 minutes")
      .orderBy("key", "session_start")
      .select("key", "n_events").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("runningTotals: flatMapGroupsWithState over a real file stream") {
    val dir = Files.createTempDirectory("graft-stream-").toString
    events.select(col("key"), col("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/in")
      .as[StreamOps.KeyedEvent]
    val q = StreamOps.runningTotals(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("running_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("running_out")
      .groupBy("key").agg(max("n").as("n"), max("total").as("total"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(out(1L) === ((3L, 6.0)))
    assert(out(2L) === ((1L, 4.0)))
  }

  test("dedupWithinWatermark: streaming duplicates dropped, state bounded by event time") {
    val dir = Files.createTempDirectory("graft-dedupwm-").toString
    val dupes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),
      (10L, ts("2024-01-01 10:00:05"), 1.0), // dup within watermark
      (11L, ts("2024-01-01 10:01:00"), 2.0)
    ).toDF("key", "ts", "value")
    dupes.write.mode("overwrite").parquet(s"$dir/in")
    val q = StreamOps.dedupWithinWatermark(
        spark.readStream.schema(dupes.schema).parquet(s"$dir/in"),
        Seq("key"), "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("dedup_wm_out").select("key").as[Long].collect().sorted.toSeq
    assert(out === Seq(10L, 11L))
    // batch fallback: plain dropDuplicates semantics
    assert(StreamOps.dedupWithinWatermark(dupes, Seq("key"), "ts").count() === 2)
  }

  test("intervalJoin: stream-stream click attribution within the window") {
    val dir = Files.createTempDirectory("graft-ssjoin-").toString
    val impressions = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:05:00"))
    ).toDF("ad", "imp_ts")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:30")), // within 1 minute -> attributed
      (1L, ts("2024-01-01 10:10:00")), // too late
      (2L, ts("2024-01-01 10:04:00"))  // before the impression
    ).toDF("ad", "click_ts")
    impressions.write.mode("overwrite").parquet(s"$dir/imp")
    clicks.write.mode("overwrite").parquet(s"$dir/clk")
    val joined = StreamOps.intervalJoin(
      spark.readStream.schema(impressions.schema).parquet(s"$dir/imp"),
      spark.readStream.schema(clicks.schema).parquet(s"$dir/clk"),
      keyCol = "ad", leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 MINUTE", watermark = "1 hour")
    val q = joined.select(col("l.ad"), col("click_ts"))
      .writeStream.format("memory").queryName("ssjoin_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("ssjoin_out").as[(Long, Timestamp)].collect().toSet
    assert(out === Set((1L, ts("2024-01-01 10:00:30"))))
    // batch parity: same three-row inputs, same single attribution
    assert(StreamOps.intervalJoin(impressions, clicks, "ad", "imp_ts", "click_ts",
      "1 MINUTE").count() === 1)
  }

  test("runningTotalsTws: transformWithState over RocksDB state store") {
    val dir = Files.createTempDirectory("graft-tws-").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
        .as[StreamOps.KeyedEvent]
      val q = StreamOps.runningTotalsTws(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table("tws_out")
        .groupBy("key").agg(max("n").as("n"), max("total").as("total"))
        .as[(Long, Long, Double)].collect().toMap2
      assert(out(1L) === ((3L, 6.0)))
      assert(out(2L) === ((1L, 4.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-static join: streaming facts enrich against a static dimension") {
    val dir = Files.createTempDirectory("graft-ss-static-").toString
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("key", "tier")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val q = spark.readStream.schema(events.schema).parquet(s"$dir/in")
      .join(dim, Seq("key")) // static side, no watermark needed
      .writeStream.format("memory").queryName("ss_static_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("ss_static_out")
      .groupBy("tier").count().as[(String, Long)].collect().toMap
    assert(out === Map("gold" -> 3L, "basic" -> 1L))
  }

  private implicit class Tup3Ops(arr: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] = arr.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
