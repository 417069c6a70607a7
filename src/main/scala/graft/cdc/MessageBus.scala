package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Message-bus abstraction over the Kafka surface the reference uses.
  *
  * The contract is the Kafka source/sink FRAME — the 7-column schema fixed
  * by Spark's Kafka connector (`FIXTURES.md §2`). With the kafka connector
  * jar on the classpath, `KafkaMessageBus` would delegate to
  * `format("kafka")` with the same options the reference sets
  * (`jibaro/datalake/cdc.py:26-38`); this environment has no kafka jar and
  * no broker, so the file-backed implementation below provides the same
  * frame + offset semantics for pipelines and tests.
  */
object MessageBus {
  val FrameSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)
  ))
}

trait MessageBus {
  /** Append records (must carry `key`,`value` binary columns) to a topic. */
  def publish(spark: SparkSession, topic: String, records: DataFrame): Unit
  /** Whole-topic batch read as the 7-column frame. */
  def readBatch(spark: SparkSession, topic: String): DataFrame
  /** Streaming read as the 7-column frame. */
  def readStream(spark: SparkSession, topic: String): DataFrame
}

/** Parquet-directory-per-topic bus. Single partition (0); offsets are
  * assigned monotonically at publish time. A TEST DOUBLE faithful to the
  * frame contract — production swaps in the Kafka connector, nothing else
  * changes (the pipelines only see the frame).
  */
final class FileMessageBus(root: String) extends MessageBus {

  def topicPath(topic: String): String = s"$root/$topic"

  override def publish(spark: SparkSession, topic: String, records: DataFrame): Unit = {
    require(records.columns.contains("key") && records.columns.contains("value"),
      "publish expects binary 'key' and 'value' columns")
    val path = topicPath(topic)
    val startOffset =
      if (graft.lake.FsUtils.pathExists(spark, path))
        spark.read.schema(MessageBus.FrameSchema).parquet(path)
          .agg(max("offset")).head() match {
            case r if r.isNullAt(0) => 0L
            case r => r.getLong(0) + 1
          }
      else 0L
    // global ordering window: acceptable for the test double (a real bus
    // assigns offsets broker-side); keeps offsets dense + deterministic
    val w = Window.orderBy(monotonically_increasing_id())
    val framed = records
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .withColumn("topic", lit(topic))
      .withColumn("partition", lit(0))
      .withColumn("offset", row_number().over(w).cast("long") + lit(startOffset - 1))
      .withColumn("timestamp", current_timestamp())
      .withColumn("timestampType", lit(0))
    framed.write.mode("append").parquet(path)
  }

  override def readBatch(spark: SparkSession, topic: String): DataFrame =
    spark.read.schema(MessageBus.FrameSchema).parquet(topicPath(topic))

  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.schema(MessageBus.FrameSchema)
      .option("maxFilesPerTrigger", "1000")
      .parquet(topicPath(topic))
}
