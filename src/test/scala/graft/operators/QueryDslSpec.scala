package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The driver has regenerated `events.parquet` with different physical `ts`
  * layouts across releases (TIMESTAMP(NANOS)→nanos-as-long, then plain
  * micros TIMESTAMP_NTZ — the round-9 silent breakage). `QueryDsl.t` must
  * normalize every layout to the same session-zoned micros TimestampType
  * so the whole catalog is layout-agnostic.
  */
class QueryDslSpec extends SparkSpecBase {
  import spark.implicits._

  private val microsUtc = 1767225600000000L // 2026-01-01T00:00:00Z

  test("t() normalizes long (nanos) and TIMESTAMP_NTZ events.ts to identical micros timestamps") {
    val ntzDir = java.nio.file.Files.createTempDirectory("graft-ev-ntz-").toString
    Seq((1L, microsUtc)).toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    val longDir = java.nio.file.Files.createTempDirectory("graft-ev-long-").toString
    Seq((1L, microsUtc * 1000L)).toDF("event_id", "ts") // nanos-as-long layout
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    val fromNtz = QueryDsl.t(spark, ntzDir, "events")
    val fromLong = QueryDsl.t(spark, longDir, "events")
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromLong.schema("ts").dataType === TimestampType)
    val a = fromNtz.select(unix_micros(col("ts"))).as[Long].head()
    val b = fromLong.select(unix_micros(col("ts"))).as[Long].head()
    assert(a === microsUtc && b === microsUtc)
  }

  test("t() on the driver's real events table yields micros TimestampType") {
    val ev = QueryDsl.t(spark, sf(), "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.filter(col("ts").isNotNull).count() > 0)
  }
}
