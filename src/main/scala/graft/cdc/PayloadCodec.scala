package graft.cdc

import graft.codec.{AvroExpressions, ConfluentWireFormat, ProtobufExpressions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, from_json, get_json_object}
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
    * wraps it. `get_json_object` returns null when `$.payload` is absent
    * (schemas.enable=false), so the bare record falls through. */
  def unwrap(framed: Column): Column = {
    val s = framed.cast("string")
    coalesce(get_json_object(s, "$.payload"), s)
  }

  override def decode(payload: Column, schemaText: String): Column =
    from_json(unwrap(payload), parseSchema(schemaText))

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
}
