package graft.examples

import graft.cdc._
import graft.codec.{AvroExpressions, AvroSchemaConverter, ConfluentWireFormat, InMemorySchemaRegistry}
import graft.conf.{GraftSettings, Layer}
import graft.lake.{LakePath, TableRef}
import graft.tables.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** Runnable walkthrough of the engine's CDC surface: Debezium-shaped
  * change events -> bus -> raw -> staged -> curated -> back to the bus.
  *
  * {{{ sbt "runMain graft.examples.MedallionDemo" }}}
  */
object MedallionDemo {

  case class Img(id: Int, name: String, weight: Double)
  case class Key(id: Int)
  case class Envelope(before: Option[Img], after: Option[Img], op: String, ts_ms: Long)
  case class Msg(k: Key, v: Envelope)

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-medallion-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-demo-").toString
    implicit val settings: GraftSettings = GraftSettings.local(root)
    val bus = new FileMessageBus(s"$root/bus")
    val registry = new InMemorySchemaRegistry
    val topic = "dbserver1.inventory.products"
    val (project, database, table) = ("demo", "inventory", "products")

    def publish(msgs: Seq[Msg]): Unit = {
      val df = msgs.toDS().toDF()
      val keySchema = AvroSchemaConverter.toAvroSchema(
        df.schema("k").dataType.asInstanceOf[StructType], "ProductKey")
      val valueSchema = AvroSchemaConverter.toAvroSchema(
        df.schema("v").dataType.asInstanceOf[StructType], "ProductEnvelope")
      val keyId = registry.register(s"$topic-key", keySchema.toString)
      val valueId = registry.register(s"$topic-value", valueSchema.toString)
      bus.publish(spark, topic, df.select(
        ConfluentWireFormat.frame(AvroExpressions.to_avro(col("k"), keySchema.toString), keyId).as("key"),
        ConfluentWireFormat.frame(AvroExpressions.to_avro(col("v"), valueSchema.toString), valueId).as("value")))
    }

    println(s"== lake root: $root")
    publish(Seq(
      Msg(Key(1), Envelope(None, Some(Img(1, "widget", 1.5)), "c", 1L)),
      Msg(Key(2), Envelope(None, Some(Img(2, "gadget", 2.5)), "c", 2L)),
      Msg(Key(3), Envelope(None, Some(Img(3, "doodad", 3.5)), "c", 3L))))
    publish(Seq(
      Msg(Key(2), Envelope(Some(Img(2, "gadget", 2.5)), Some(Img(2, "gadget-v2", 2.7)), "u", 4L)),
      Msg(Key(3), Envelope(Some(Img(3, "doodad", 3.5)), None, "d", 5L))))

    CdcPipelines.kafkaToRaw(spark, bus, topic, project, database, table)
    CdcPipelines.rawToStaged(spark, project, database, table, ConfluentAvroCodec, registry)
    CdcPipelines.stagedToCurated(spark, project, database, table)

    println("== curated state after {3 inserts, 1 update, 1 delete}:")
    val curated = GraftTable(spark, LakePath.data(TableRef(Layer.Curated, project, database, table)))
    curated.read().orderBy("id").show(truncate = false)
    println("== curated history:")
    curated.history().select("version", "operation", "numFiles").show()

    CdcPipelines.dataframeToKafka(spark, curated.read().select("id", "name", "weight"),
      "outbound.products", Seq("id"), registry, bus)
    println("== outbound frames (wire-format header -> schema id):")
    bus.readBatch(spark, "outbound.products")
      .select(ConfluentWireFormat.schemaId(col("key")).as("keySchemaId"),
        ConfluentWireFormat.schemaId(col("value")).as("valueSchemaId"),
        length(col("value")).as("valueBytes"))
      .show()
    spark.stop()
  }
}
