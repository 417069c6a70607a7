package graft.codec

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CodecSpec extends SparkSpecBase {
  import spark.implicits._

  test("wire format: frame -> schemaId + payload round trip") {
    val payload = "hello".getBytes("UTF-8")
    val df = Seq(Tuple1(payload)).toDF("p")
      .select(ConfluentWireFormat.frame(col("p"), schemaId = 12345).as("framed"))
    val row = df.select(
      ConfluentWireFormat.schemaId(col("framed")).as("id"),
      ConfluentWireFormat.avroPayload(col("framed")).as("payload")).head()
    assert(row.getInt(0) === 12345)
    assert(row.getAs[Array[Byte]](1).toSeq === payload.toSeq)
  }

  test("proto frame has the extra message-index byte") {
    val h = ConfluentWireFormat.header(7, protobuf = true)
    assert(h.length === 6 && h(0) === 0x00 && h(5) === 0x00 && h(4) === 7)
  }

  test("avro round trip: nested struct, arrays, maps, timestamps, binary") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")
    val df = Seq(
      (1, "name-1", Some(2.5), Seq(1L, 2L), Map("a" -> 1), ts,
        Array[Byte](1, 2, 3), (10, Some("inner"))),
      (2, null.asInstanceOf[String], None, Seq.empty[Long], Map.empty[String, Int], ts,
        Array.empty[Byte], (20, None))
    ).toDF("id", "name", "weight", "longs", "m", "ts", "bin", "nested")
    val packed = df.select(struct(df.columns.map(col): _*).as("v"))
    val avroSchema = AvroSchemaConverter.toAvroSchema(
      packed.schema("v").dataType.asInstanceOf[StructType], "RoundTrip")
    val encoded = packed.select(AvroExpressions.to_avro(col("v"), avroSchema.toString).as("b"))
    val decoded = encoded.select(AvroExpressions.from_avro(col("b"), avroSchema.toString).as("v"))
      .select("v.*")
    assert(decoded.schema === df.schema.copy(fields = decoded.schema.fields)) // same col set
    val (orig, back) = (df.orderBy("id").collect(), decoded.orderBy("id").collect())
    orig.zip(back).foreach { case (a, b) =>
      assert(a.toSeq.map {
        case arr: Array[Byte] => arr.toSeq
        case x => x
      } === b.toSeq.map {
        case arr: Array[Byte] => arr.toSeq
        case x => x
      })
    }
  }

  test("schema converter round-trips catalyst types") {
    val st = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("arr", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("m", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
      StructField("nested", StructType(Seq(StructField("x", IntegerType))), nullable = true)
    ))
    val avro = AvroSchemaConverter.toAvroSchema(st, "T")
    val back = AvroSchemaConverter.toSqlType(avro).asInstanceOf[StructType]
    assert(back === st)
  }

  test("registry: same schema keeps id, new schema bumps version") {
    val r = new InMemorySchemaRegistry
    val id1 = r.register("topic-value", """"string"""")
    val id2 = r.register("topic-value", """"string"""")
    val id3 = r.register("topic-value", """"bytes"""")
    assert(id1 === id2)
    assert(id3 !== id1)
    assert(r.getById(id3).get.version === 2)
    assert(r.latest("topic-value").get.id === id3)
  }

  test("proto schema text generation") {
    val st = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("scores", ArrayType(DoubleType)),
      StructField("meta", StructType(Seq(StructField("k", LongType))))
    ))
    val proto = ProtoSchemaGen.protoFile(st, "Product")
    assert(proto.contains("syntax = \"proto3\""))
    assert(proto.contains("int32 id = 1;"))
    assert(proto.contains("repeated double scores = 3;"))
    assert(proto.contains("message MetaMsg"))
  }

  test("avro encode widens Short/Byte into the schema's INT fields") {
    val df = Seq((1.toShort, 2.toByte), (300.toShort, -5.toByte)).toDF("s", "b")
    val packed = df.select(struct(col("s"), col("b")).as("v"))
    val schemaJson = AvroSchemaConverter.toAvroSchema(
      packed.schema("v").dataType, "Rec").toString
    // GenericDatumWriter writes INT via (Integer) datum — an unwidened
    // boxed Short/Byte threw ClassCastException on every row
    val back = packed
      .select(AvroExpressions.to_avro(col("v"), schemaJson).as("bin"))
      .select(AvroExpressions.from_avro(col("bin"), schemaJson).as("v"))
      .select(col("v.s"), col("v.b")).as[(Int, Int)].collect().toSet
    assert(back === Set((1, 2), (300, -5)))
  }

  test("avro encode honors timestamp-millis targets (micros / 1000, mirrored by decode)") {
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05.678")
    val df = Seq(Tuple1(ts)).toDF("t")
    val packed = df.select(struct(col("t")).as("v"))
    // a registry schema authored by ANOTHER producer: millis logical type
    val millisSchema =
      """{"type":"record","name":"Rec","fields":[
        |  {"name":"t","type":{"type":"long","logicalType":"timestamp-millis"}}
        |]}""".stripMargin
    val back = packed
      .select(AvroExpressions.to_avro(col("v"), millisSchema).as("bin"))
      .select(AvroExpressions.from_avro(col("bin"), millisSchema).as("v"))
      .select(col("v.t")).as[java.sql.Timestamp].head()
    assert(back === ts)
  }

  test("avro encode maps record fields by NAME, not position") {
    val df = Seq((7, "x")).toDF("id", "name")
    val packed = df.select(struct(col("id"), col("name")).as("v"))
    // target schema lists the fields in the OPPOSITE order (registry UIs
    // alphabetize; evolved schemas append) — positional put would write
    // id into name and vice versa
    val reversed =
      """{"type":"record","name":"Rec","fields":[
        |  {"name":"name","type":"string"},{"name":"id","type":"int"}
        |]}""".stripMargin
    val back = packed
      .select(AvroExpressions.to_avro(col("v"), reversed).as("bin"))
      .select(AvroExpressions.from_avro(col("bin"), reversed).as("v"))
      .select(col("v.id"), col("v.name")).as[(Int, String)].head()
    assert(back === ((7, "x")))
    // a frame field the schema lacks refuses with the field named
    val missing =
      """{"type":"record","name":"Rec","fields":[{"name":"id","type":"int"}]}"""
    val e = intercept[Exception] {
      packed.select(AvroExpressions.to_avro(col("v"), missing).as("bin")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("name"), s"got: $msgs")
  }
}
