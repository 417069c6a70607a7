package graft.codec

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/** `from_avro` / `to_avro` as native Catalyst expressions over avro-core
  * 1.12 — the stand-in for the absent spark-avro connector (SURVEY.md §2.B
  * "Format codec functions"). Decode failures THROW (FAILFAST — the only
  * mode the reference uses, `jibaro/avro_handler.py:25`).
  *
  * Expressions are serialized per-task, so the non-thread-safe Avro
  * reader/writer instances below are task-local — safe to reuse across
  * rows, which is what keeps per-row overhead to the Avro decode itself.
  * CodegenFallback is standard for format codecs (spark-avro's own
  * AvroDataToCatalyst is non-codegen too); the surrounding projection
  * still whole-stage-codegens.
  */
object AvroExpressions {

  def from_avro(data: Column, schemaJson: String): Column =
    ColumnBridge.column(FromAvro(ColumnBridge.expression(data),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(schemaJson), StringType)))

  def to_avro(data: Column, schemaJson: String): Column =
    ColumnBridge.column(ToAvro(ColumnBridge.expression(data),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(schemaJson), StringType)))

  // ----------------------------------------------------- avro -> catalyst

  private[codec] def avroToCatalyst(value: Any, schema: Schema): Any = {
    if (value == null) return null
    schema.getType match {
      case Schema.Type.UNION =>
        val nonNull = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only union(null,T) supported: $schema")
        avroToCatalyst(value, nonNull.head)
      case Schema.Type.RECORD =>
        val rec = value.asInstanceOf[GenericRecord]
        val fields = schema.getFields.asScala
        val out = new Array[Any](fields.size)
        var i = 0
        while (i < fields.size) {
          out(i) = avroToCatalyst(rec.get(i), fields(i).schema())
          i += 1
        }
        InternalRow.fromSeq(out.toIndexedSeq)
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(value.toString)
      case Schema.Type.BYTES =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining())
        bb.duplicate().get(arr)
        arr
      case Schema.Type.FIXED =>
        value.asInstanceOf[GenericFixed].bytes().clone()
      case Schema.Type.LONG =>
        schema.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => value.asInstanceOf[Long] * 1000L
          case _ => value.asInstanceOf[Long]
        }
      case Schema.Type.INT | Schema.Type.FLOAT | Schema.Type.DOUBLE | Schema.Type.BOOLEAN =>
        value
      case Schema.Type.ARRAY =>
        val elems = value.asInstanceOf[java.util.Collection[Any]].asScala
        new GenericArrayData(elems.map(avroToCatalyst(_, schema.getElementType)).toArray)
      case Schema.Type.MAP =>
        val m = value.asInstanceOf[java.util.Map[Any, Any]].asScala
        val keys = m.keys.map(k => UTF8String.fromString(k.toString): Any).toArray
        val vals = m.values.map(avroToCatalyst(_, schema.getValueType)).toArray
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case other =>
        throw new UnsupportedOperationException(s"unsupported Avro type: $other")
    }
  }

  // ----------------------------------------------------- catalyst -> avro

  private[codec] def catalystToAvro(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    val target =
      if (schema.getType == Schema.Type.UNION)
        schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else schema
    (dt, target.getType) match {
      case (st: StructType, Schema.Type.RECORD) =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(target)
        var i = 0
        while (i < st.fields.length) {
          // match by NAME (spark-avro semantics), not position: a registry
          // schema whose field order differs from the struct (alphabetized
          // UIs, evolved schemas) would otherwise silently swap same-typed
          // values between fields
          val af = target.getField(st.fields(i).name)
          require(af != null,
            s"avro record '${target.getFullName}' has no field " +
              s"'${st.fields(i).name}' — schema/frame mismatch")
          rec.put(af.pos(), catalystToAvro(row.get(i, st.fields(i).dataType),
            st.fields(i).dataType, af.schema()))
          i += 1
        }
        rec
      case (StringType, _)  => value.asInstanceOf[UTF8String].toString
      case (BinaryType, _)  => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      // GenericDatumWriter writes INT via a cast to java.lang.Integer — a
      // boxed Short/Byte must widen here or every row throws
      case (ShortType, _)   => value.asInstanceOf[Short].toInt
      case (ByteType, _)    => value.asInstanceOf[Byte].toInt
      // Catalyst timestamps are MICROS; a millis-logical target gets the
      // same /1000 the decode side's *1000 mirrors — writing raw micros
      // into a millis field would silently shift timestamps 1000x
      case (TimestampType, Schema.Type.LONG)
          if target.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        value.asInstanceOf[Long] / 1000L
      case (ArrayType(elem, _), Schema.Type.ARRAY) =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(catalystToAvro(arr.get(i, elem), elem, target.getElementType))
          i += 1
        }
        out
      case (MapType(StringType, v, _), Schema.Type.MAP) =>
        val m = value.asInstanceOf[MapData]
        val out = new java.util.HashMap[String, Any](m.numElements())
        val keys = m.keyArray()
        val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          out.put(keys.get(i, StringType).toString, catalystToAvro(vals.get(i, v), v, target.getValueType))
          i += 1
        }
        out
      case _ => value // primitives incl. date-int and timestamp-micros-long
    }
  }
}

/** Decode Confluent-framed-stripped Avro binary into a Catalyst value given
  * a literal writer-schema JSON (one literal schema per decode slice —
  * exactly the reference's per-schema-id batch splitting). */
case class FromAvro(data: Expression, schemaExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = data
  override def right: Expression = schemaExpr
  override def prettyName: String = "graft_from_avro"

  @transient private lazy val avroSchema =
    new Schema.Parser().parse(schemaExpr.eval(null).toString)
  @transient private lazy val reader = new GenericDatumReader[Any](avroSchema)

  override lazy val dataType: DataType = AvroSchemaConverter.toSqlType(avroSchema)
  override def nullable: Boolean = data.nullable

  override protected def nullSafeEval(bytes: Any, schema: Any): Any = {
    val dec = DecoderFactory.get().binaryDecoder(bytes.asInstanceOf[Array[Byte]], null)
    AvroExpressions.avroToCatalyst(reader.read(null, dec), avroSchema)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(data = l, schemaExpr = r)
}

/** Encode a Catalyst value as Avro binary for a literal target schema. */
case class ToAvro(data: Expression, schemaExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = data
  override def right: Expression = schemaExpr
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val avroSchema =
    new Schema.Parser().parse(schemaExpr.eval(null).toString)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroSchema)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = data.nullable

  override protected def nullSafeEval(value: Any, schema: Any): Any = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(AvroExpressions.catalystToAvro(value, data.dataType, avroSchema), enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(data = l, schemaExpr = r)
}
