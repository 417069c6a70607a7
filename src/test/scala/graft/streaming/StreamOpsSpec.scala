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

  private implicit class Tup3Ops(arr: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] = arr.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
