package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Confluent wire format: `[0x00 magic][4-byte big-endian schema id]
  * [payload]`, with one extra message-index byte (0x00) for Protobuf —
  * byte layout per the reference (`jibaro/datalake/avro_handler.py:31-40`,
  * `protobuf_handler.py:49-58`, builder `kafka.py:86-109`).
  *
  * Schema-id extraction uses built-in codegen'd expressions
  * (`conv(hex(substring(..)))`) — replacing the reference's Python UDF
  * `binary_to_string` (`jibaro/utils.py:182-184`), which was its only UDF.
  */
object ConfluentWireFormat {

  val Magic: Byte = 0x00

  /** Header bytes for a known schema id (driver-side literal). */
  def header(schemaId: Int, protobuf: Boolean = false): Array[Byte] = {
    val base = Array[Byte](
      Magic,
      ((schemaId >> 24) & 0xFF).toByte,
      ((schemaId >> 16) & 0xFF).toByte,
      ((schemaId >> 8) & 0xFF).toByte,
      (schemaId & 0xFF).toByte)
    if (protobuf) base :+ 0x00.toByte else base
  }

  /** Frame a binary payload column with the wire-format header. */
  def frame(payload: Column, schemaId: Int, protobuf: Boolean = false): Column =
    concat(lit(header(schemaId, protobuf)), payload)

  /** Big-endian int schema id from bytes 2..5 of a framed column
    * (1-based substring, binary-safe — mirrors `substring(value, 2, 4)`). */
  def schemaId(framed: Column): Column =
    conv(hex(substring(framed, 2, 4)), 16, 10).cast("int")

  /** Payload of an Avro frame: from byte 6 (`avro_handler.py:35,39`). */
  def avroPayload(framed: Column): Column =
    substring(framed, lit(6), length(framed) - 5)

  /** Payload of a Protobuf frame: from byte 7 — the extra message-index
    * byte ("I need to jump 7 bytes instead of 6",
    * `protobuf_handler.py:48`). */
  def protoPayload(framed: Column): Column =
    substring(framed, lit(7), length(framed) - 6)
}
