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
}
