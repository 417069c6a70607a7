package graft.codec

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Catalyst <-> Avro schema conversion on avro-core (the spark-avro
  * connector jar is absent in this environment — SURVEY.md §0).
  *
  * Reproduces the schema semantics the reference gets from Spark's JVM
  * `SchemaConverters` via py4j (`jibaro/utils.py:37-40`): nullable fields
  * become `union(null, T)`, timestamps map to long/timestamp-micros,
  * dates to int/date.
  */
object AvroSchemaConverter {

  /** StructType -> Avro record schema. */
  def toAvroSchema(
      dt: DataType,
      recordName: String = "topLevelRecord",
      namespace: String = "graft"): Schema =
    toAvro(dt, nullable = false, recordName, namespace)

  private def toAvro(dt: DataType, nullable: Boolean, name: String, ns: String): Schema = {
    val base = dt match {
      case StringType  => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(toAvro(elem, containsNull, s"${name}_item", ns))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(toAvro(v, valueContainsNull, s"${name}_value", ns))
      case st: StructType =>
        val fields = st.fields.map { f =>
          new Schema.Field(f.name,
            toAvro(f.dataType, f.nullable, f.name, s"$ns.$name"), null, null)
        }
        Schema.createRecord(name, null, ns, false, fields.toList.asJava)
      case other =>
        throw new UnsupportedOperationException(s"cannot convert $other to Avro")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Avro schema -> (Catalyst type, nullable). */
  def toSqlTypeWithNullability(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      val hasNull = branches.size != nonNull.size
      nonNull match {
        case Seq(only) =>
          val (dt, _) = toSqlTypeWithNullability(only)
          (dt, hasNull)
        case _ =>
          throw new UnsupportedOperationException(
            s"only union(null, T) supported, got $s")
      }
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, nullable) = toSqlTypeWithNullability(f.schema())
        StructField(f.name(), dt, nullable)
      }
      (StructType(fields.toSeq), false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.INT =>
      val dt =
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
      (dt, false)
    case Schema.Type.LONG =>
      val dt = s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => TimestampType
        case _: LogicalTypes.TimestampMillis => TimestampType
        case _ => LongType
      }
      (dt, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.ARRAY =>
      val (elem, n) = toSqlTypeWithNullability(s.getElementType)
      (ArrayType(elem, n), false)
    case Schema.Type.MAP =>
      val (v, n) = toSqlTypeWithNullability(s.getValueType)
      (MapType(StringType, v, n), false)
    case other =>
      throw new UnsupportedOperationException(s"unsupported Avro type $other")
  }

  def toSqlType(s: Schema): DataType = toSqlTypeWithNullability(s)._1
}
