package graft.cdc

import graft.codec.{AvroExpressions, ConfluentWireFormat}
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

/** Confluent-Protobuf codec slot: 6-byte header (extra message-index byte).
  * Payload slicing and schema registration work today; binary DECODE needs
  * a protobuf runtime, absent from this environment (SURVEY.md §7) — the
  * reference's own protobuf path likewise requires Spark >= 3.4 + runtime
  * protoc (`jibaro/datalake/protobuf_handler.py:136-180`). Supplying a
  * decoder here is the single integration point once descriptors exist.
  */
object ConfluentProtobufCodec extends PayloadCodec {
  override def name: String = "protobuf"
  override def payload(framed: Column): Column = ConfluentWireFormat.protoPayload(framed)
  override def decode(payload: Column, schemaText: String): Column =
    throw new UnsupportedOperationException(
      "protobuf decode requires a protobuf runtime jar; register descriptors and " +
        "plug a decoder into ConfluentProtobufCodec")
}
