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
  /** Streaming read as the 7-column frame. `options` merge over the bus's
    * defaults, caller-wins — the rate-cap knob (`maxOffsetsPerTrigger` on
    * Kafka, `maxFilesPerTrigger` here) rides through this map, mirroring
    * the reference's `**kwargs` merge (`cdc.py:29-38`). */
  def readStream(spark: SparkSession, topic: String,
      options: Map[String, String] = Map.empty): DataFrame
}

/** Parquet-directory-per-topic bus, Kafka-faithful semantics: records are
  * routed to `numPartitions` partitions by key hash (null keys to partition
  * 0), and offsets are dense and monotone PER PARTITION — so per-key
  * ordering holds exactly as on a real broker, and offset assignment
  * parallelizes across partitions instead of funneling through one global
  * sort. A TEST DOUBLE faithful to the frame contract — production swaps in
  * the Kafka connector, nothing else changes (the pipelines only see the
  * frame).
  */
final class FileMessageBus(root: String, numPartitions: Int = 1) extends MessageBus {
  require(numPartitions >= 1, "numPartitions must be >= 1")

  def topicPath(topic: String): String = s"$root/$topic"

  override def publish(spark: SparkSession, topic: String, records: DataFrame): Unit = {
    require(records.columns.contains("key") && records.columns.contains("value"),
      "publish expects binary 'key' and 'value' columns")
    val path = topicPath(topic)
    // next offset per partition (the COLLECTED result is one row per
    // partition; the scan behind it reads the topic's partition/offset
    // columns — O(records) per publish, quadratic over a long publish
    // sequence. Deliberate for a TEST DOUBLE: an offset sidecar would be a
    // second source of truth whose loss/staleness silently collides
    // offsets, and the real bus is Kafka, where the broker owns offsets.)
    val startByPartition: Map[Int, Long] =
      if (graft.lake.FsUtils.pathExists(spark, path))
        spark.read.schema(MessageBus.FrameSchema).parquet(path)
          .groupBy("partition").agg(max("offset").as("m"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1)).toMap
      else Map.empty
    // key-hash partitioning (Kafka's default for keyed topics) keeps every
    // key's records in one partition, preserving per-key order
    val partCol =
      if (numPartitions == 1) lit(0)
      else when(col("key").isNull, lit(0))
        .otherwise(pmod(xxhash64(col("key")), lit(numPartitions)).cast("int"))
    // per-partition ordering window: numPartitions parallel reducers, not
    // one global sort
    val w = Window.partitionBy(col("partition")).orderBy(monotonically_increasing_id())
    val startExpr = coalesce(
      element_at(typedLit(startByPartition), col("partition")), lit(0L))
    val framed = records
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .withColumn("topic", lit(topic))
      .withColumn("partition", partCol)
      .withColumn("offset", row_number().over(w).cast("long") + startExpr - 1)
      .withColumn("timestamp", current_timestamp())
      .withColumn("timestampType", lit(0))
    framed.write.mode("append").parquet(path)
  }

  /** A topic nobody has published to yet is EMPTY, not an error — same as
    * subscribing to a fresh Kafka topic. */
  override def readBatch(spark: SparkSession, topic: String): DataFrame =
    if (!graft.lake.FsUtils.pathExists(spark, topicPath(topic)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], MessageBus.FrameSchema)
    else spark.read.schema(MessageBus.FrameSchema).parquet(topicPath(topic))

  override def readStream(spark: SparkSession, topic: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    // the file-stream source rejects a missing directory; an empty one is
    // a valid zero-message topic
    graft.lake.FsUtils.fs(spark, topicPath(topic))
      .mkdirs(new org.apache.hadoop.fs.Path(topicPath(topic)))
    spark.readStream.schema(MessageBus.FrameSchema)
      .option("maxFilesPerTrigger", "1000") // default rate cap; caller-overridable
      .options(options)
      .parquet(topicPath(topic))
  }
}
