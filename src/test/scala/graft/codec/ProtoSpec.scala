package graft.codec

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ProtoSpec extends SparkSpecBase {
  import spark.implicits._

  test("proto text parser handles the ProtoSchemaGen subset") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("scores", ArrayType(DoubleType)),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType), StructField("flag", BooleanType))))))
    val text = ProtoSchemaGen.protoFile(schema, "Rec")
    val msg = ProtoWire.messageFor(text)
    assert(msg.name === "Rec")
    assert(msg.fields.map(f => (f.name, f.number, f.repeated)) ===
      Seq(("id", 1, false), ("name", 2, false), ("scores", 3, true), ("inner", 4, false)))
    val inner = msg.fields.last.tpe.asInstanceOf[ProtoWire.ProtoMessageRef].message
    assert(inner.fields.map(_.name) === Seq("a", "flag"))
    // parsed message maps back to the source Catalyst types
    assert(ProtoWire.toCatalyst(msg).map(_.dataType) ===
      Seq(LongType, StringType, ArrayType(DoubleType, containsNull = false),
        StructType(Seq(StructField("a", IntegerType), StructField("flag", BooleanType)))))
  }

  test("protobuf round trip: scalars, strings, bytes, repeated, nested") {
    val df = Seq(
      (1L, "hello", 2.5, 3.5f, true, Array[Byte](9, 8), Seq(1, 2, 3), (42, "in")),
      (2L, "", 0.0, 0.0f, false, Array.empty[Byte], Seq.empty[Int], (0, "")),
      (-3L, "neg", -1.25, -2.5f, true, Array[Byte](0), Seq(-1, 0, 7), (-5, "x"))
    ).toDF("id", "name", "d", "f", "flag", "bin", "nums", "inner")
    val packed = df.select(struct(df.columns.map(col): _*).as("v"))
    val structType = packed.schema("v").dataType.asInstanceOf[StructType]
    val protoText = ProtoSchemaGen.protoFile(structType, "Rec")

    val decoded = packed
      .select(ProtobufExpressions.to_protobuf(col("v")).as("b"))
      .select(ProtobufExpressions.from_protobuf(col("b"), protoText).as("v"))
      .select("v.*")

    val orig = df.orderBy("id").collect()
    val back = decoded.orderBy("id").collect()
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

  test("proto3 decode semantics: absent fields default, unknown fields skip") {
    // encode with a 2-field schema, decode with a 3-field superset schema
    val narrow = StructType(Seq(StructField("a", IntegerType), StructField("s", StringType)))
    val wide = """syntax = "proto3";
      message Rec { int32 a = 1; string s = 2; int64 extra = 3; }"""
    val df = Seq((7, "hi")).toDF("a", "s")
      .select(struct(col("a"), col("s")).as("v"))
    val row = df.select(ProtobufExpressions.to_protobuf(col("v")).as("b"))
      .select(ProtobufExpressions.from_protobuf(col("b"), wide).as("v"))
      .select("v.*").head()
    assert(row.getInt(0) === 7 && row.getString(1) === "hi" && row.getLong(2) === 0L)

    // reverse: encode wide (extra field set), decode narrow — unknown skipped
    val wideDf = Seq((7, "hi", 99L)).toDF("a", "s", "extra")
      .select(struct(col("a"), col("s"), col("extra")).as("v"))
    val narrowText = ProtoSchemaGen.protoFile(narrow, "Rec")
    val r2 = wideDf.select(ProtobufExpressions.to_protobuf(col("v")).as("b"))
      .select(ProtobufExpressions.from_protobuf(col("b"), narrowText).as("v"))
      .select("v.*").head()
    assert(r2.getInt(0) === 7 && r2.getString(1) === "hi")
  }

  test("unpacked repeated scalars are accepted (proto2-style writers)") {
    // hand-build: field 1 (repeated int32) written unpacked, one tag per element
    val w = new ProtoWire.Writer()
    Seq(10L, 20L, 30L).foreach { v => w.writeTag(1, ProtoWire.Varint); w.writeVarint(v) }
    val bytes = w.toByteArray
    val msg = ProtoWire.ProtoMessage("R", Seq(
      ProtoWire.ProtoField("xs", 1, ProtoWire.ProtoScalar("int32"), repeated = true)))
    val row = ProtoWire.decodeMessage(msg, bytes, 0, bytes.length)
    assert(row.getArray(0).toIntArray().toSeq === Seq(10, 20, 30))
  }

  test("zigzag sint32/sint64 decode") {
    val w = new ProtoWire.Writer()
    w.writeTag(1, ProtoWire.Varint); w.writeVarint(ProtoWire.zigzagEncode(-5L))
    w.writeTag(2, ProtoWire.Varint); w.writeVarint(ProtoWire.zigzagEncode(123456789012L))
    val bytes = w.toByteArray
    val msg = ProtoWire.ProtoMessage("R", Seq(
      ProtoWire.ProtoField("a", 1, ProtoWire.ProtoScalar("sint32"), repeated = false),
      ProtoWire.ProtoField("b", 2, ProtoWire.ProtoScalar("sint64"), repeated = false)))
    val row = ProtoWire.decodeMessage(msg, bytes, 0, bytes.length)
    assert(row.getInt(0) === -5 && row.getLong(1) === 123456789012L)
  }

  test("descriptor set round-trips through the engine's own decoder") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("inner", StructType(Seq(StructField("a", IntegerType))))))
    val bytes = ProtoDescriptorGen.forStructType(schema, "Rec", "rec.proto")
    val set = ProtoDescriptorGen.decodeDescriptorSet(bytes)
    val files = set.getArray(0)
    assert(files.numElements() === 1)
    val file = files.getStruct(0, 4)
    assert(file.getUTF8String(0).toString === "rec.proto")
    assert(file.getUTF8String(3).toString === "proto3")
    val messages = file.getArray(2)
    assert(messages.numElements() === 1)
    val rec = messages.getStruct(0, 3)
    assert(rec.getUTF8String(0).toString === "Rec")
    val fields = rec.getArray(1)
    assert(fields.numElements() === 3)
    val f0 = fields.getStruct(0, 5)
    assert(f0.getUTF8String(0).toString === "id" && f0.getInt(1) === 1)
    // nested message emitted for the struct field
    assert(rec.getArray(2).numElements() === 1)
  }

  test("uint32 decodes as an unsigned LONG (its declared Catalyst type)") {
    val text = "syntax = \"proto3\";\nmessage M { uint32 n = 1; }\n"
    val msg = ProtoWire.messageFor(text)
    assert(ProtoWire.toCatalyst(msg)("n").dataType === LongType)
    // 0xFFFFFFFF — one past Int.MaxValue territory; a .toInt would read -1
    val w = new ProtoWire.Writer()
    w.writeTag(1, ProtoWire.Varint)
    w.writeVarint(0xFFFFFFFFL)
    val bytes = w.toByteArray
    val row = ProtoWire.decodeMessage(msg, bytes, 0, bytes.length)
    assert(row.getLong(0) === 4294967295L)
    // absent field defaults to 0L in the same slot type
    assert(ProtoWire.decodeMessage(msg, Array.empty[Byte], 0, 0).getLong(0) === 0L)
  }

  test("truncated or corrupt bytes THROW (never silently read the parent's bytes)") {
    val text = "syntax = \"proto3\";\nmessage M { string s = 1; int64 n = 2; }\n"
    val msg = ProtoWire.messageFor(text)
    // declared string length runs past the buffer
    val w = new ProtoWire.Writer()
    w.writeTag(1, ProtoWire.Len)
    w.writeVarint(100L) // claims 100 bytes; only 2 follow
    w.out.write(Array[Byte]('h', 'i'), 0, 2)
    val b = w.toByteArray
    intercept[Exception](ProtoWire.decodeMessage(msg, b, 0, b.length))
    // varint cut mid-continuation
    val t = Array[Byte](0x10, 0x80.toByte) // field 2 tag, then a dangling continuation byte
    intercept[Exception](ProtoWire.decodeMessage(msg, t, 0, t.length))
  }

  test("null elements in a repeated field refuse with the field named") {
    val df = Seq(Tuple1(Seq[java.lang.Integer](1, null, 3))).toDF("nums")
    val packed = df.select(struct(col("nums")).as("v"))
    val e = intercept[Exception] {
      packed.select(ProtobufExpressions.to_protobuf(col("v")).as("b")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("null element"), s"got: $msgs")
  }

  test("registry-style .proto text parses: options, imports, enum, optional, oneof, map") {
    val text =
      """syntax = "proto3";
        |package acme.events;
        |import "google/protobuf/timestamp.proto";
        |option java_package = "com.acme.events";
        |option java_multiple_files = true;
        |
        |enum Color {
        |  COLOR_UNSPECIFIED = 0;
        |  RED = 1;
        |  GREEN = 2;
        |}
        |
        |message Event {
        |  option deprecated = false;
        |  reserved 9, 10;
        |  int64 id = 1;
        |  optional string name = 2; // proto3 presence
        |  Color color = 3;
        |  map<string, int64> counts = 4;
        |  oneof payload {
        |    string text = 5;
        |    bytes blob = 6;
        |  }
        |}
        |""".stripMargin
    val msg = ProtoWire.messageFor(text, Some("Event"))
    assert(msg.fields.map(f => (f.name, f.number, f.repeated)) === Seq(
      ("id", 1, false), ("name", 2, false), ("color", 3, false),
      ("counts", 4, true), ("text", 5, false), ("blob", 6, false)))
    // enum decodes as int32; map is a repeated key/value entry message
    val cat = ProtoWire.toCatalyst(msg)
    assert(cat("color").dataType === IntegerType)
    assert(cat("counts").dataType ===
      ArrayType(StructType(Seq(StructField("key", StringType),
        StructField("value", LongType))), containsNull = false))
    // wire check: enum varint + one map entry decode through the parsed shape
    val entry = new ProtoWire.Writer()
    entry.writeTag(1, ProtoWire.Len)
    val kb = "a".getBytes("UTF-8"); entry.writeVarint(kb.length.toLong); entry.out.write(kb, 0, kb.length)
    entry.writeTag(2, ProtoWire.Varint); entry.writeVarint(7L)
    val w = new ProtoWire.Writer()
    w.writeTag(3, ProtoWire.Varint); w.writeVarint(2L) // GREEN
    w.writeLenDelimited(4, entry.toByteArray)
    val b = w.toByteArray
    val row = ProtoWire.decodeMessage(msg, b, 0, b.length)
    assert(row.getInt(2) === 2)
    val entries = row.getArray(3)
    assert(entries.numElements() === 1)
    val kv = entries.getStruct(0, 2)
    assert(kv.getUTF8String(0).toString === "a" && kv.getLong(1) === 7L)
  }

  test("array-of-struct renders in the .proto and round-trips") {
    val df = Seq((1L, Seq((10, "x"), (20, "y")))).toDF("id", "items")
    val packed = df.select(struct(col("id"), col("items")).as("v"))
    val structType = packed.schema("v").dataType.asInstanceOf[StructType]
    // ProtoSchemaGen previously threw on array<struct> while the encoder
    // supported it — the registration path must render what encode emits
    val protoText = ProtoSchemaGen.protoFile(structType, "Rec")
    val back = packed
      .select(ProtobufExpressions.to_protobuf(col("v")).as("b"))
      .select(ProtobufExpressions.from_protobuf(col("b"), protoText).as("v"))
      .select("v.id", "v.items")
      .as[(Long, Seq[(Int, String)])].collect()
    assert(back.toSeq === Seq((1L, Seq((10, "x"), (20, "y")))))
  }
}
