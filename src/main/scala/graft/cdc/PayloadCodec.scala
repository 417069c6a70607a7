package graft.cdc

import graft.codec.{AvroExpressions, ConfluentWireFormat, ProtobufExpressions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, array_sort, from_json, get_json_object, json_object_keys, lit, when}
import org.apache.spark.sql.types.{DataType, StructType}

/** Wire-format payload codec strategy — the dispatch target of
  * `raw_to_staged(content_type=...)` (`jibaro/datalake/cdc.py:54-88`). */
trait PayloadCodec {
  def name: String
  /** Strip the Confluent header from a framed binary column. */
  def payload(framed: Column): Column
  /** Decode a stripped payload given the registry schema text. */
  def decode(payload: Column, schemaText: String): Column
}

/** Confluent-Avro codec: 5-byte header, Avro-binary payload, decode via
  * the engine's native `FromAvro` expression (FAILFAST). */
object ConfluentAvroCodec extends PayloadCodec {
  override def name: String = "avro"
  override def payload(framed: Column): Column = ConfluentWireFormat.avroPayload(framed)
  override def decode(payload: Column, schemaText: String): Column =
    AvroExpressions.from_avro(payload, schemaText)
}

/** Confluent-Protobuf codec: 6-byte header (extra message-index byte),
  * proto3 payload decoded by the engine's pure-Scala wire codec against the
  * registry's .proto text (`jibaro/datalake/protobuf_handler.py:30-133`) —
  * no protobuf runtime jar needed. */
object ConfluentProtobufCodec extends PayloadCodec {
  override def name: String = "protobuf"
  override def payload(framed: Column): Column = ConfluentWireFormat.protoPayload(framed)
  override def decode(payload: Column, schemaText: String): Column =
    ProtobufExpressions.from_protobuf(payload, schemaText)
}

/** Kafka-Connect JSON codec (`org.apache.kafka.connect.json.JsonConverter`,
  * the converter the reference's lab registers at
  * `lake_lab/register-postgres_jsonConverter_apache_version.json:16-19` but
  * whose decode path `cdc.py:87-88` leaves `NotImplemented`): plain JSON
  * bytes, NO Confluent header, no registry id. With `schemas.enable=true`
  * each record is a `{"schema":…,"payload":…}` envelope; with `=false` the
  * record IS the payload — [[ConnectJsonCodec.unwrap]] handles both.
  *
  * There being no registry schema, `decode` takes a SPARK schema text
  * (DDL or `StructType.json`) — the raw_to_staged JSON path infers it per
  * micro-batch (see `CdcPipelines.decodeJsonBatch`). */
object ConnectJsonCodec extends PayloadCodec {
  override def name: String = "json"

  /** No wire header to strip: the payload is the framed bytes. */
  override def payload(framed: Column): Column = framed

  /** The payload JSON string, whether or not the Connect schema envelope
    * wraps it. A record is an envelope ONLY when its top-level keys are
    * exactly {schema, payload} — testing mere `$.payload` presence would
    * swallow any schemas.enable=false table with a column literally named
    * `payload` (the whole record would silently collapse to that field).
    * `json_object_keys` is null on malformed JSON, so those fall through
    * to the raw string and FAILFAST decode reports them. */
  def unwrap(framed: Column): Column = {
    val s = framed.cast("string")
    when(isEnvelope(s), get_json_object(s, "$.payload")).otherwise(s)
  }

  /** The embedded Connect schema, or null when the record is NOT the
    * exact envelope. Must share [[isEnvelope]] with [[unwrap]]: a bare
    * `$.schema` probe on a schemas.enable=false record whose payload has
    * a top-level field literally named `schema` would return non-null
    * while unwrap (correctly) leaves the record whole — the full record
    * would then decode against that inner field as if it were the Connect
    * schema, and every real column would come back silently null
    * (FAILFAST catches malformed JSON, not missing fields). */
  def envelopeSchema(framed: Column): Column = {
    val s = framed.cast("string")
    when(isEnvelope(s), get_json_object(s, "$.schema"))
      .otherwise(lit(null).cast("string"))
  }

  /** A record is a Connect envelope ONLY when its top-level keys are
    * exactly {schema, payload}. `json_object_keys` is null on malformed
    * JSON, so those records fall through to the raw string and FAILFAST
    * decode reports them. */
  private def isEnvelope(s: Column): Column =
    array_sort(json_object_keys(s)) === array(lit("payload"), lit("schema"))

  override def decode(payload: Column, schemaText: String): Column =
    from_json(unwrap(payload), parseSchema(schemaText), FailfastOptions)

  /** FAILFAST, like the Avro/Proto codecs: a malformed record must halt
    * the stream, not become a silent all-null row. */
  private[cdc] val FailfastOptions: Map[String, String] = Map("mode" -> "FAILFAST")

  private[cdc] def parseSchema(schemaText: String): StructType = {
    val parsed =
      try DataType.fromJson(schemaText)
      catch { case _: Exception => DataType.fromDDL(schemaText) }
    parsed match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"JSON decode schema must be a struct, got $other")
    }
  }

  /** Map an embedded Kafka-Connect schema (the `schema` member the
    * JsonConverter writes with `schemas.enable=true`) to a Spark type, so
    * decode is TYPE-FAITHFUL (int32 stays INT) instead of inference-wide
    * (every number a BIGINT). Returns None on null/absent/unrecognized
    * input — callers fall back to Spark-side inference.
    *
    * Logical types ride their base encoding: Connect `Decimal` is base64
    * bytes (→ BinaryType, which `from_json` base64-decodes), `Timestamp`/
    * `Date`/`Time` are epoch int64/int32 (→ LongType/IntegerType), the
    * same values Debezium consumers see. */
  def connectSchemaToSpark(schemaJson: String): Option[DataType] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def toSpark(j: JValue): Option[DataType] = j match {
      case o: JObject =>
        o \ "type" match {
          case JString("int8")    => Some(org.apache.spark.sql.types.ByteType)
          case JString("int16")   => Some(org.apache.spark.sql.types.ShortType)
          case JString("int32")   => Some(org.apache.spark.sql.types.IntegerType)
          case JString("int64")   => Some(org.apache.spark.sql.types.LongType)
          case JString("float")   => Some(org.apache.spark.sql.types.FloatType)
          case JString("double")  => Some(org.apache.spark.sql.types.DoubleType)
          case JString("boolean") => Some(org.apache.spark.sql.types.BooleanType)
          case JString("string")  => Some(org.apache.spark.sql.types.StringType)
          case JString("bytes")   => Some(org.apache.spark.sql.types.BinaryType)
          case JString("array") =>
            toSpark(o \ "items").map(org.apache.spark.sql.types.ArrayType(_, true))
          case JString("map") =>
            for (k <- toSpark(o \ "keys"); v <- toSpark(o \ "values"))
              yield org.apache.spark.sql.types.MapType(k, v, valueContainsNull = true)
          case JString("struct") =>
            o \ "fields" match {
              case JArray(fs) =>
                val fields = fs.map { f =>
                  for {
                    name <- (f \ "field") match {
                      case JString(n) => Some(n); case _ => None
                    }
                    dt <- toSpark(f)
                  } yield org.apache.spark.sql.types.StructField(name, dt, nullable = true)
                }
                if (fields.forall(_.isDefined))
                  Some(StructType(fields.flatten))
                else None
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
    try toSpark(JsonMethods.parse(schemaJson))
    catch { case scala.util.control.NonFatal(_) => None }
  }
}
