package graft.codec

import org.apache.spark.sql.types._

/** StructType -> proto3 schema text (reference `jibaro/utils.py:57-100`,
  * `generate_proto` / `convert_schema_to_proto` type map). Used when
  * registering Protobuf subjects for the Kafka reverse path. Runtime
  * protobuf DECODE is deferred in this environment (no protobuf-java jar —
  * SURVEY.md §7); the descriptor-file interface in `PayloadCodec` is the
  * integration point once the jar exists.
  */
object ProtoSchemaGen {

  private def scalarType(dt: DataType): String = dt match {
    case StringType             => "string"
    case ShortType | IntegerType | ByteType => "int32"
    case LongType               => "int64"
    case FloatType              => "float"
    case DoubleType             => "double"
    case BooleanType            => "bool"
    case TimestampType          => "int64"
    case BinaryType             => "bytes"
    case DateType               => "int32"
    case other =>
      throw new UnsupportedOperationException(s"type not supported in proto: $other")
  }

  /** Render `message {name} { ... }` with nested messages for structs. */
  def toProto(schema: StructType, name: String, indent: String = ""): String = {
    val sb = new StringBuilder
    sb.append(s"${indent}message $name {\n")
    var idx = 0
    schema.fields.foreach { f =>
      idx += 1
      f.dataType match {
        case st: StructType =>
          val nested = s"${f.name.capitalize}Msg"
          sb.append(toProto(st, nested, indent + "  "))
          sb.append(s"$indent  $nested ${f.name} = $idx;\n")
        // repeated message — the same mapping ProtoWire.fromStructType
        // applies, so the rendered .proto decodes the encoder's bytes
        case ArrayType(st: StructType, _) =>
          val nested = s"${f.name.capitalize}Msg"
          sb.append(toProto(st, nested, indent + "  "))
          sb.append(s"$indent  repeated $nested ${f.name} = $idx;\n")
        case ArrayType(elem, _) =>
          sb.append(s"$indent  repeated ${scalarType(elem)} ${f.name} = $idx;\n")
        case dt =>
          sb.append(s"$indent  ${scalarType(dt)} ${f.name} = $idx;\n")
      }
    }
    sb.append(s"$indent}\n")
    sb.toString
  }

  /** Full .proto file: syntax header + key/value messages. */
  def protoFile(schema: StructType, messageName: String): String =
    s"""syntax = "proto3";\n\n${toProto(schema, messageName)}"""
}
