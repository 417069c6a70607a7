package graft.codec

import graft.codec.ProtoWire._
import org.apache.spark.sql.types.StructType

/** Binary `FileDescriptorSet` generation — the reference shells out to
  * protoc for descriptor files (`jibaro/utils.py:125-167`,
  * `protobuf_handler.py:136-180`); here the descriptor set is built
  * directly, because descriptor.proto messages are themselves proto3
  * messages and the engine has a proto3 encoder. The output is a standard
  * `google.protobuf.FileDescriptorSet` readable by protoc /
  * spark-protobuf / any descriptor-consuming tool.
  *
  * Field numbers below are from google/protobuf/descriptor.proto (public
  * schema): FileDescriptorSet.file=1; FileDescriptorProto.name=1,
  * package=2, message_type=4, syntax=12; DescriptorProto.name=1, field=2,
  * nested_type=3; FieldDescriptorProto.name=1, number=3, label=4, type=5,
  * type_name=6.
  */
object ProtoDescriptorGen {

  // FieldDescriptorProto.Type enum values (descriptor.proto)
  private val TypeEnum: Map[String, Int] = Map(
    "double" -> 1, "float" -> 2, "int64" -> 3, "uint64" -> 4, "int32" -> 5,
    "fixed64" -> 6, "fixed32" -> 7, "bool" -> 8, "string" -> 9,
    "bytes" -> 12, "uint32" -> 13, "sfixed32" -> 15, "sfixed64" -> 16,
    "sint32" -> 17, "sint64" -> 18)
  private val TypeMessage = 11
  private val LabelOptional = 1
  private val LabelRepeated = 3

  private def fieldDescriptor(f: ProtoField, scopePrefix: String): Array[Byte] = {
    val w = new Writer()
    w.writeLenDelimited(1, f.name.getBytes("UTF-8"))
    w.writeTag(3, Varint); w.writeVarint(f.number.toLong)
    w.writeTag(4, Varint); w.writeVarint(if (f.repeated) LabelRepeated.toLong else LabelOptional.toLong)
    f.tpe match {
      case ProtoScalar(s) =>
        w.writeTag(5, Varint); w.writeVarint(TypeEnum(s).toLong)
      case ProtoMessageRef(m) =>
        w.writeTag(5, Varint); w.writeVarint(TypeMessage.toLong)
        w.writeLenDelimited(6, s"$scopePrefix.${m.name}".getBytes("UTF-8"))
    }
    w.toByteArray
  }

  private def messageDescriptor(m: ProtoMessage, scopePrefix: String): Array[Byte] = {
    val w = new Writer()
    w.writeLenDelimited(1, m.name.getBytes("UTF-8"))
    val selfPrefix = s"$scopePrefix.${m.name}"
    m.fields.foreach { f =>
      w.writeLenDelimited(2, fieldDescriptor(f, selfPrefix))
    }
    // nested message definitions (one per distinct message-typed field)
    val nested = m.fields.collect { case ProtoField(_, _, ProtoMessageRef(sub), _) => sub }
      .groupBy(_.name).map(_._2.head)
    nested.foreach { sub =>
      w.writeLenDelimited(3, messageDescriptor(sub, selfPrefix))
    }
    w.toByteArray
  }

  /** FileDescriptorSet bytes for one .proto file's messages. */
  def fileDescriptorSet(fileName: String, messages: Seq[ProtoMessage],
      packageName: Option[String] = None): Array[Byte] = {
    val file = new Writer()
    file.writeLenDelimited(1, fileName.getBytes("UTF-8"))
    packageName.foreach(p => file.writeLenDelimited(2, p.getBytes("UTF-8")))
    val prefix = packageName.map("." + _).getOrElse("")
    messages.foreach(m => file.writeLenDelimited(4, messageDescriptor(m, prefix)))
    file.writeLenDelimited(12, "proto3".getBytes("UTF-8"))
    val set = new Writer()
    set.writeLenDelimited(1, file.toByteArray)
    set.toByteArray
  }

  /** Descriptor set for a Catalyst schema, named per `ProtoSchemaGen`. */
  def forStructType(schema: StructType, messageName: String,
      fileName: String = "generated.proto"): Array[Byte] =
    fileDescriptorSet(fileName, Seq(fromStructType(schema, messageName)))

  // -------------------------------------------- self-describing readback

  /** descriptor.proto modeled in the engine's own message model — enough
    * to decode a FileDescriptorSet back (used by tests to prove the
    * generated descriptors are structurally valid proto). */
  val FieldDescriptorProto: ProtoMessage = ProtoMessage("FieldDescriptorProto", Seq(
    ProtoField("name", 1, ProtoScalar("string"), repeated = false),
    ProtoField("number", 3, ProtoScalar("int32"), repeated = false),
    ProtoField("label", 4, ProtoScalar("int32"), repeated = false),
    ProtoField("type", 5, ProtoScalar("int32"), repeated = false),
    ProtoField("type_name", 6, ProtoScalar("string"), repeated = false)))

  val DescriptorProto: ProtoMessage = ProtoMessage("DescriptorProto", Seq(
    ProtoField("name", 1, ProtoScalar("string"), repeated = false),
    ProtoField("field", 2, ProtoMessageRef(FieldDescriptorProto), repeated = true),
    ProtoField("nested_type", 3, ProtoMessageRef(
      // one level of nesting is all the generator emits per level; deeper
      // levels decode as raw bytes fields here
      ProtoMessage("DescriptorProto", Seq(
        ProtoField("name", 1, ProtoScalar("string"), repeated = false),
        ProtoField("field", 2, ProtoMessageRef(FieldDescriptorProto), repeated = true)))),
      repeated = true)))

  val FileDescriptorProto: ProtoMessage = ProtoMessage("FileDescriptorProto", Seq(
    ProtoField("name", 1, ProtoScalar("string"), repeated = false),
    ProtoField("package", 2, ProtoScalar("string"), repeated = false),
    ProtoField("message_type", 4, ProtoMessageRef(DescriptorProto), repeated = true),
    ProtoField("syntax", 12, ProtoScalar("string"), repeated = false)))

  val FileDescriptorSet: ProtoMessage = ProtoMessage("FileDescriptorSet", Seq(
    ProtoField("file", 1, ProtoMessageRef(FileDescriptorProto), repeated = true)))

  /** Decode a FileDescriptorSet produced by this generator (or any tool)
    * into the engine's row form — proof the bytes are real proto. */
  def decodeDescriptorSet(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    decodeMessage(FileDescriptorSet, bytes, 0, bytes.length)
}
