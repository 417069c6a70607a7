package graft.api

import graft.SparkSpecBase
import graft.api.lake._
import graft.conf.GraftSettings
import graft.lake.{LakePath, TableRef}
import java.nio.file.Files

class LakeApiSpec extends SparkSpecBase {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-api-").toString
  private implicit val settings: GraftSettings = GraftSettings.local(root)

  private val data = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))

  test("writeLake/readLake round-trips every path format") {
    for (fmt <- Seq("parquet", "json", "orc", "csv")) {
      val ref = TableRef("raw", "p", "db", s"t_$fmt")
      val df = data.toDF("id", "name", "score")
      df.writeLake(ref, format = fmt,
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      val back = spark.readLake(ref, format = fmt,
        options = if (fmt == "csv") Map("header" -> "true", "inferSchema" -> "true") else Map.empty)
      assert(back.count() === 3, s"format $fmt")
      assert(back.columns.toSet === Set("id", "name", "score"), s"format $fmt")
    }
  }

  test("graft format routes through the versioned table (append mode)") {
    val ref = TableRef("curated", "p", "db", "vt")
    data.toDF("id", "name", "score").writeLake(ref, format = "graft", mode = "append")
    data.toDF("id", "name", "score").writeLake(ref, format = "graft", mode = "append")
    assert(spark.readLake(ref, format = "graft").count() === 6)
    data.take(1).toDF("id", "name", "score").writeLake(ref, format = "graft", mode = "overwrite")
    assert(spark.readLake(ref, format = "graft").count() === 1)
  }

  test("non-path batch formats fall through to a pathless load() with options") {
    val df = spark.readLake(TableRef("raw", "p", "db", "t"),
      format = "graft.api.PathlessTestSource", options = Map("n" -> "5"))
    assert(df.count() === 5)
    assert(df.columns.toSeq === Seq("i"))
  }

  test("non-path streaming formats fall through (rate source)") {
    val df = spark.readStreamLake(TableRef("raw", "p", "db", "t"),
      format = "rate", options = Map("rowsPerSecond" -> "1"))
    assert(df.isStreaming)
    assert(df.columns.toSet === Set("timestamp", "value"))
  }

  test("startLake injects the control-bucket checkpoint") {
    val ref = TableRef("raw", "p", "db", "stream_t")
    val src = TableRef("raw", "p", "db", "stream_src")
    data.toDF("id", "name", "score").writeLake(src)
    val q = spark.readStreamLake(src,
        schema = Some(data.toDF("id", "name", "score").schema))
      .writeStream
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .startLake(ref)
    q.awaitTermination()
    assert(spark.readLake(ref).count() === 3)
    assert(graft.lake.FsUtils.pathExists(spark, LakePath.checkpoint(ref)),
      "auto-injected checkpoint missing")
  }
}
