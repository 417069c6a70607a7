package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `from_protobuf` / `to_protobuf` as native Catalyst expressions over the
  * pure-Scala proto3 wire codec (`ProtoWire`) — the stand-in for the absent
  * spark-protobuf connector, closing the reference's protobuf handler
  * surface (`jibaro/datalake/protobuf_handler.py:30-133`) without a
  * protobuf-java jar. The schema contract is the .proto TEXT (what the
  * registry stores — `jibaro/utils.py:125-167` registers generated .proto),
  * parsed once per task.
  *
  * CodegenFallback is standard for format codecs (spark-protobuf's own
  * ProtobufDataToCatalyst is non-codegen too); the surrounding projection
  * still whole-stage-codegens.
  */
object ProtobufExpressions {

  def from_protobuf(data: Column, protoText: String, messageName: Option[String] = None): Column =
    ColumnBridge.column(FromProtobuf(ColumnBridge.expression(data),
      Literal(UTF8String.fromString(protoText), StringType),
      messageName))

  def to_protobuf(data: Column): Column =
    ColumnBridge.column(ToProtobuf(ColumnBridge.expression(data)))
}

/** Decode proto3 binary (Confluent header already stripped) into a Catalyst
  * struct, given a literal .proto text. FAILFAST: malformed bytes throw. */
case class FromProtobuf(data: Expression, schemaExpr: Expression,
    messageName: Option[String])
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = data
  override def right: Expression = schemaExpr
  override def prettyName: String = "graft_from_protobuf"

  @transient private lazy val message =
    ProtoWire.messageFor(schemaExpr.eval(null).toString, messageName)
  // the decode PLAN (field lookup, defaults, nested decoders) builds once
  // per task and serves every row — see ProtoWire.MessageDecoder
  @transient private lazy val decoder = new ProtoWire.MessageDecoder(message)

  override lazy val dataType: DataType = ProtoWire.toCatalyst(message)
  override def nullable: Boolean = data.nullable

  override protected def nullSafeEval(bytes: Any, schema: Any): Any = {
    val buf = bytes.asInstanceOf[Array[Byte]]
    decoder.decode(buf, 0, buf.length)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(data = l, schemaExpr = r)
}

/** Encode a Catalyst struct as proto3 binary. Field numbers are
  * position+1 (the `ProtoSchemaGen` numbering), so output decodes against
  * `ProtoSchemaGen.protoFile(child.dataType)`. */
case class ToProtobuf(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_to_protobuf"

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(value: Any): Any =
    ProtoWire.encodeMessage(value.asInstanceOf[InternalRow], structType)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
