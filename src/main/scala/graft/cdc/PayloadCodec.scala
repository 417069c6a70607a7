package graft.cdc

import graft.codec.{AvroExpressions, ConfluentWireFormat, ProtobufExpressions}
import org.apache.spark.sql.Column

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
