package graft.codec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** Pure-Scala proto3 wire format: varint/zigzag/fixed/length-delimited
  * parsing and serialization, a minimal message model, and the .proto-text
  * parser for the subset `ProtoSchemaGen` emits (messages, nested messages,
  * repeated, scalar fields). This closes the reference's second wire format
  * (`jibaro/datalake/protobuf_handler.py:30-133`) without a protobuf
  * runtime jar: the wire format itself is ~10 primitives.
  *
  * Decode semantics are proto3: absent scalar fields read back as their
  * defaults (0 / "" / false / empty), absent messages as null, absent
  * repeated fields as empty arrays; unknown field numbers are skipped.
  * Packed and unpacked repeated scalars are both accepted.
  */
object ProtoWire {

  // ------------------------------------------------------------- model

  sealed trait ProtoType
  final case class ProtoScalar(name: String) extends ProtoType
  final case class ProtoMessageRef(message: ProtoMessage) extends ProtoType

  final case class ProtoField(name: String, number: Int, tpe: ProtoType, repeated: Boolean)
  final case class ProtoMessage(name: String, fields: Seq[ProtoField])

  // wire types
  final val Varint = 0
  final val I64 = 1
  final val Len = 2
  final val I32 = 5

  private val VarintScalars =
    Set("int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool")
  private val I64Scalars = Set("fixed64", "sfixed64", "double")
  private val I32Scalars = Set("fixed32", "sfixed32", "float")

  def wireTypeOf(t: ProtoType): Int = t match {
    case ProtoScalar(s) if VarintScalars(s) => Varint
    case ProtoScalar(s) if I64Scalars(s)    => I64
    case ProtoScalar(s) if I32Scalars(s)    => I32
    case ProtoScalar("string") | ProtoScalar("bytes") => Len
    case _: ProtoMessageRef => Len
    case ProtoScalar(other) => throw new UnsupportedOperationException(s"proto type $other")
  }

  // --------------------------------------------- catalyst type mapping

  def scalarToCatalyst(s: String): DataType = s match {
    case "int32" | "sint32" | "sfixed32" | "fixed32" => IntegerType
    case "int64" | "sint64" | "sfixed64" | "fixed64" | "uint32" | "uint64" => LongType
    case "bool"   => BooleanType
    case "string" => StringType
    case "bytes"  => BinaryType
    case "float"  => FloatType
    case "double" => DoubleType
    case other => throw new UnsupportedOperationException(s"proto scalar $other")
  }

  def toCatalyst(m: ProtoMessage): StructType =
    StructType(m.fields.map { f =>
      val base = f.tpe match {
        case ProtoScalar(s)      => scalarToCatalyst(s)
        case ProtoMessageRef(sub) => toCatalyst(sub)
      }
      val dt = if (f.repeated) ArrayType(base, containsNull = false) else base
      StructField(f.name, dt, nullable = true)
    })

  /** Derive the proto message a Catalyst struct maps to — identical
    * numbering (position+1) and type map to `ProtoSchemaGen.toProto`, so
    * bytes encoded from a StructType decode correctly against the .proto
    * text generated for that same StructType. */
  def fromStructType(schema: StructType, name: String): ProtoMessage = {
    def scalar(dt: DataType): String = dt match {
      case StringType => "string"
      case ShortType | IntegerType | ByteType => "int32"
      case LongType => "int64"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "bool"
      case TimestampType => "int64"
      case BinaryType => "bytes"
      case DateType => "int32"
      case other => throw new UnsupportedOperationException(s"type not supported in proto: $other")
    }
    ProtoMessage(name, schema.fields.zipWithIndex.toSeq.map { case (f, i) =>
      val tpe = f.dataType match {
        case st: StructType => ProtoMessageRef(fromStructType(st, s"${f.name.capitalize}Msg"))
        case ArrayType(st: StructType, _) => ProtoMessageRef(fromStructType(st, s"${f.name.capitalize}Msg"))
        case ArrayType(elem, _) => ProtoScalar(scalar(elem))
        case dt => ProtoScalar(scalar(dt))
      }
      val repeated = f.dataType.isInstanceOf[ArrayType]
      ProtoField(f.name, i + 1, tpe, repeated)
    })
  }

  // ------------------------------------------------------------ reader

  /** Positional reader over a byte range. EVERY primitive bound-checks
    * against `end` — a truncated or corrupt nested slice must THROW
    * (FAILFAST), never silently continue into the PARENT message's bytes
    * and return a plausible-but-wrong row. */
  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }

    def readLE32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4
      v
    }

    def readLE64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      v
    }

    def slice(len: Int): (Int, Int) = {
      require(len >= 0, "negative length-delimited length")
      val start = pos
      pos += len
      require(pos <= end, "truncated length-delimited field")
      (start, start + len)
    }

    def bytes(len: Int): Array[Byte] = {
      val (s, e) = slice(len)
      java.util.Arrays.copyOfRange(buf, s, e)
    }

    def skip(wireType: Int): Unit = wireType match {
      case Varint => readVarint()
      case I64    =>
        pos += 8
        require(pos <= end, "truncated fixed64")
      case Len    => val n = readVarint().toInt; slice(n); ()
      case I32    =>
        pos += 4
        require(pos <= end, "truncated fixed32")
      case other  => throw new IllegalArgumentException(s"unknown wire type $other")
    }
  }

  def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)
  def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  // ----------------------------------------------------------- decoder

  /** Per-message decode PLAN: field-number lookup table, proto3 defaults
    * template and nested decoders computed ONCE (construct once per
    * expression/task and reuse across rows — [[FromProtobuf]] does), not
    * per row: the per-row HashMap + default re-derivation was pure
    * repeated allocation on a streaming decode's hot path. */
  final class MessageDecoder(val msg: ProtoMessage) {
    private val fieldArr: Array[ProtoField] = msg.fields.toArray
    private val n = fieldArr.length
    private val maxNo = if (n == 0) 0 else fieldArr.iterator.map(_.number).max
    // dense number->index table for the common generated case (numbers are
    // position+1); registry protos with sparse numbering fall back to a map
    private val dense: Array[Int] =
      if (maxNo <= 2 * n + 16) {
        val a = Array.fill(maxNo + 1)(-1)
        var i = 0
        while (i < n) { a(fieldArr(i).number) = i; i += 1 }
        a
      } else null
    private val sparse: Map[Int, Int] =
      if (dense == null) fieldArr.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
      else null
    private def indexOf(no: Int): Int =
      if (dense != null) { if (no >= 0 && no < dense.length) dense(no) else -1 }
      else sparse.getOrElse(no, -1)
    private val subs: Array[MessageDecoder] = fieldArr.map {
      _.tpe match { case ProtoMessageRef(s) => new MessageDecoder(s); case _ => null }
    }
    // proto3 defaults for absent fields (immutable values — safe to share
    // across rows; repeated slots stay null and get per-row accumulators)
    private val defaults: Array[Any] = fieldArr.map { f =>
      if (f.repeated) null
      else f.tpe match {
        case ProtoScalar("string") => UTF8String.EMPTY_UTF8
        case ProtoScalar("bytes")  => Array.empty[Byte]
        case ProtoScalar("bool")   => false
        case ProtoScalar("float")  => 0.0f
        case ProtoScalar("double") => 0.0
        case ProtoScalar(s) if scalarToCatalyst(s) == IntegerType => 0
        case ProtoScalar(_) => 0L
        case _: ProtoMessageRef => null
      }
    }

    def decode(buf: Array[Byte], start: Int, end: Int): InternalRow = {
      val values = defaults.clone()
      var repeatedAcc: Array[mutable.ArrayBuffer[Any]] = null
      var i = 0
      while (i < n) {
        if (fieldArr(i).repeated) {
          if (repeatedAcc == null) repeatedAcc = new Array[mutable.ArrayBuffer[Any]](n)
          repeatedAcc(i) = new mutable.ArrayBuffer[Any]
        }
        i += 1
      }

      val r = new Reader(buf, start, end)
      while (r.hasRemaining) {
        val tag = r.readVarint()
        val fieldNo = (tag >>> 3).toInt
        val wt = (tag & 7).toInt
        val idx = indexOf(fieldNo)
        if (idx < 0) r.skip(wt)
        else {
          val f = fieldArr(idx)
          f.tpe match {
            case _: ProtoMessageRef =>
              val len = r.readVarint().toInt
              val (s, e) = r.slice(len)
              val row = subs(idx).decode(buf, s, e)
              if (f.repeated) repeatedAcc(idx) += row else values(idx) = row
            case ProtoScalar(st) =>
              val expected = wireTypeOf(f.tpe)
              if (f.repeated && wt == Len && expected != Len) {
                // packed repeated scalars; the limit must stay inside THIS
                // message's slice or a corrupt length reads the parent
                val len = r.readVarint().toInt
                val limit = r.pos + len
                require(len >= 0 && limit <= r.end, "truncated packed field")
                while (r.pos < limit) repeatedAcc(idx) += readScalar(r, st)
              } else if (f.repeated) {
                repeatedAcc(idx) += readScalar(r, st)
              } else {
                values(idx) = readScalar(r, st)
              }
          }
        }
      }
      i = 0
      while (i < n) {
        if (fieldArr(i).repeated) values(i) = new GenericArrayData(repeatedAcc(i).toArray)
        i += 1
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }
  }

  /** Decode one message occupying buf[start, end) into an InternalRow laid
    * out per `toCatalyst(msg)`. One-shot convenience — hot paths construct
    * a [[MessageDecoder]] once and reuse it. */
  def decodeMessage(msg: ProtoMessage, buf: Array[Byte], start: Int, end: Int): InternalRow =
    new MessageDecoder(msg).decode(buf, start, end)

  private def readScalar(r: Reader, st: String): Any = st match {
    case "int32"              => r.readVarint().toInt
    // uint32's Catalyst type is LongType (unsigned doesn't fit an Int):
    // zero-extend — a .toInt would sign-truncate large values AND box an
    // Integer into a LongType slot (ClassCastException downstream)
    case "uint32"             => r.readVarint() & 0xFFFFFFFFL
    case "int64" | "uint64"   => r.readVarint()
    case "sint32"             => zigzagDecode(r.readVarint()).toInt
    case "sint64"             => zigzagDecode(r.readVarint())
    case "bool"               => r.readVarint() != 0L
    case "fixed32" | "sfixed32" => r.readLE32()
    case "fixed64" | "sfixed64" => r.readLE64()
    case "float"              => java.lang.Float.intBitsToFloat(r.readLE32())
    case "double"             => java.lang.Double.longBitsToDouble(r.readLE64())
    case "string"             =>
      val len = r.readVarint().toInt
      UTF8String.fromBytes(r.bytes(len))
    case "bytes"              =>
      val len = r.readVarint().toInt
      r.bytes(len)
    case other => throw new UnsupportedOperationException(s"proto scalar $other")
  }

  // ----------------------------------------------------------- encoder

  final class Writer(val out: ByteArrayOutputStream = new ByteArrayOutputStream()) {
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def writeTag(fieldNo: Int, wireType: Int): Unit =
      writeVarint((fieldNo.toLong << 3) | wireType)
    def writeLE32(v: Int): Unit = {
      var i = 0
      while (i < 4) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
    }
    def writeLE64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def writeLenDelimited(fieldNo: Int, bytes: Array[Byte]): Unit = {
      writeTag(fieldNo, Len)
      writeVarint(bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
    }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** Encode a Catalyst row as a proto3 message. Field numbers are
    * position+1 — the `ProtoSchemaGen`/`fromStructType` numbering — so the
    * output decodes against the .proto generated for `schema`. Null fields
    * are omitted (proto3 presence); numeric/bool repeated fields are
    * packed. */
  def encodeMessage(row: InternalRow, schema: StructType): Array[Byte] = {
    val w = new Writer()
    encodeInto(w, row, schema)
    w.toByteArray
  }

  private def encodeInto(w: Writer, row: InternalRow, schema: StructType): Unit = {
    var i = 0
    val n = schema.fields.length
    while (i < n) {
      if (!row.isNullAt(i)) {
        val f = schema.fields(i)
        val fieldNo = i + 1
        f.dataType match {
          case ArrayType(elem, _) =>
            encodeRepeated(w, fieldNo, row.getArray(i), elem)
          case st: StructType =>
            val sub = new Writer()
            encodeInto(sub, row.getStruct(i, st.fields.length), st)
            w.writeLenDelimited(fieldNo, sub.toByteArray)
          case dt =>
            encodeScalar(w, fieldNo, row.get(i, dt), dt)
        }
      }
      i += 1
    }
  }

  private def encodeRepeated(w: Writer, fieldNo: Int, arr: ArrayData, elem: DataType): Unit = {
    // proto3 repeated fields have no null-element representation; refuse
    // with the field named instead of an opaque NPE/unboxing error deep in
    // the writer (decode-side arrays are containsNull=false by contract,
    // but the encoder accepts arbitrary user frames)
    def checkNull(j: Int): Unit =
      if (arr.isNullAt(j)) throw new IllegalArgumentException(
        s"proto3 repeated field $fieldNo cannot hold a null element " +
          s"(index $j) — filter nulls before to_protobuf")
    elem match {
      case StringType =>
        var j = 0
        while (j < arr.numElements()) {
          checkNull(j)
          w.writeLenDelimited(fieldNo, arr.getUTF8String(j).getBytes)
          j += 1
        }
      case BinaryType =>
        var j = 0
        while (j < arr.numElements()) {
          checkNull(j)
          w.writeLenDelimited(fieldNo, arr.getBinary(j))
          j += 1
        }
      case st: StructType =>
        var j = 0
        while (j < arr.numElements()) {
          checkNull(j)
          val sub = new Writer()
          encodeInto(sub, arr.getStruct(j, st.fields.length), st)
          w.writeLenDelimited(fieldNo, sub.toByteArray)
          j += 1
        }
      case dt =>
        // packed numeric/bool
        val packed = new Writer()
        var j = 0
        while (j < arr.numElements()) {
          checkNull(j)
          writePackedElement(packed, arr.get(j, dt), dt)
          j += 1
        }
        w.writeLenDelimited(fieldNo, packed.toByteArray)
    }
  }

  private def writePackedElement(w: Writer, v: Any, dt: DataType): Unit = dt match {
    case IntegerType | DateType => w.writeVarint(v.asInstanceOf[Int].toLong)
    case ShortType  => w.writeVarint(v.asInstanceOf[Short].toLong)
    case ByteType   => w.writeVarint(v.asInstanceOf[Byte].toLong)
    case LongType | TimestampType => w.writeVarint(v.asInstanceOf[Long])
    case BooleanType => w.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case FloatType  => w.writeLE32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case DoubleType => w.writeLE64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case other => throw new UnsupportedOperationException(s"repeated $other not supported in proto")
  }

  private def encodeScalar(w: Writer, fieldNo: Int, v: Any, dt: DataType): Unit = dt match {
    case IntegerType | DateType =>
      w.writeTag(fieldNo, Varint); w.writeVarint(v.asInstanceOf[Int].toLong)
    case ShortType =>
      w.writeTag(fieldNo, Varint); w.writeVarint(v.asInstanceOf[Short].toLong)
    case ByteType =>
      w.writeTag(fieldNo, Varint); w.writeVarint(v.asInstanceOf[Byte].toLong)
    case LongType | TimestampType =>
      w.writeTag(fieldNo, Varint); w.writeVarint(v.asInstanceOf[Long])
    case BooleanType =>
      w.writeTag(fieldNo, Varint); w.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case FloatType =>
      w.writeTag(fieldNo, I32); w.writeLE32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case DoubleType =>
      w.writeTag(fieldNo, I64); w.writeLE64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case StringType =>
      w.writeLenDelimited(fieldNo, v.asInstanceOf[UTF8String].getBytes)
    case BinaryType =>
      w.writeLenDelimited(fieldNo, v.asInstanceOf[Array[Byte]])
    case other => throw new UnsupportedOperationException(s"type not supported in proto: $other")
  }

  // ------------------------------------------------------ .proto parser

  /** Parse a .proto file. Covers the `ProtoSchemaGen` output subset PLUS
    * the constructs real registry-stored schemas (Debezium and friends)
    * routinely carry: `option`/`import`/`reserved` statements (skipped),
    * the proto3 `optional` label (wire-identical to a plain field here),
    * `enum` blocks (varint int32 on the wire — decoded as int32), `oneof`
    * groups (flattened: members are ordinary optional fields on the wire)
    * and `map<K,V>` fields (wire format IS a repeated entry message with
    * key=1/value=2 — synthesized as exactly that). Comments (`//` and
    * `/* */`) are stripped. Returns top-level messages in declaration
    * order. */
  def parseProtoFile(text: String): Seq[ProtoMessage] = {
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(text, " ")
    val stripped = noBlock.linesIterator.map { l =>
      val c = l.indexOf("//")
      if (c >= 0) l.substring(0, c) else l
    }.mkString("\n")
    val tokens = "\"[^\"]*\"|[A-Za-z0-9_.]+|[{}=;<>,]".r.findAllIn(stripped).toVector
    var pos = 0
    def peek: String = if (pos < tokens.size) tokens(pos) else ""
    def next(): String = { val t = peek; pos += 1; t }
    def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t' but got '$got' at token $pos")
    }
    // `option foo = bar;` / `reserved 2, 3;` / `import "x.proto";` — skip
    // through the terminating ';' (options may carry aggregate `{...}`
    // bodies; balance braces)
    def skipStatement(): Unit = {
      var depth = 0
      var t = next()
      while (!(t == ";" && depth == 0) && pos <= tokens.size) {
        t = next()
        if (t == "{") depth += 1
        if (t == "}") depth -= 1
      }
    }

    def parseEnum(scope: mutable.Map[String, ProtoType]): Unit = {
      expect("enum")
      val name = next()
      expect("{")
      while (peek != "}") skipStatement() // values (and options) end in ';'
      expect("}")
      // proto3 enums are open int32 varints on the wire
      scope(name) = ProtoScalar("int32")
    }

    def resolve(scope: mutable.Map[String, ProtoType], tpeName: String): ProtoType =
      scope.get(tpeName) match {
        case Some(t) => t
        case None =>
          scalarToCatalyst(tpeName) // validates
          ProtoScalar(tpeName)
      }

    def parseMessage(scope: mutable.Map[String, ProtoType]): ProtoMessage = {
      expect("message")
      val name = next()
      expect("{")
      val local = mutable.Map.empty[String, ProtoType] ++ scope
      val fields = mutable.ArrayBuffer.empty[ProtoField]

      def parseField(): Unit = {
        val repeated = peek == "repeated"
        if (repeated) next()
        if (peek == "optional") next() // proto3 presence label — wire-identical
        if (peek == "map") {
          // map<K,V> name = N;  ==  repeated NameEntry {K key=1; V value=2}
          next(); expect("<")
          val kType = resolve(local, next())
          expect(",")
          val vType = resolve(local, next())
          expect(">")
          val fieldName = next()
          expect("=")
          val number = next().toInt
          skipStatement() // ';' (possibly after field options '[...]'-free subset)
          val entry = ProtoMessage(s"${fieldName.capitalize}Entry", Seq(
            ProtoField("key", 1, kType, repeated = false),
            ProtoField("value", 2, vType, repeated = false)))
          fields += ProtoField(fieldName, number, ProtoMessageRef(entry), repeated = true)
        } else {
          val tpeName = next()
          val fieldName = next()
          expect("=")
          val number = next().toInt
          skipStatement() // ';'
          fields += ProtoField(fieldName, number, resolve(local, tpeName), repeated)
        }
      }

      while (peek != "}") {
        peek match {
          case "message" =>
            val nested = parseMessage(local)
            local(nested.name) = ProtoMessageRef(nested)
          case "enum" => parseEnum(local)
          case "option" | "reserved" => skipStatement()
          case "oneof" =>
            // members are ordinary optional fields on the wire — flatten
            next(); next(); expect("{")
            while (peek != "}") parseField()
            expect("}")
          case _ => parseField()
        }
      }
      expect("}")
      ProtoMessage(name, fields.toSeq)
    }

    val top = mutable.ArrayBuffer.empty[ProtoMessage]
    val topScope = mutable.Map.empty[String, ProtoType]
    while (pos < tokens.size) {
      peek match {
        case "syntax" => next(); expect("="); next(); expect(";")
        case "package" => next(); next(); expect(";")
        case "option" | "import" | "reserved" => skipStatement()
        case "enum" => parseEnum(topScope)
        case "message" =>
          val m = parseMessage(topScope)
          topScope(m.name) = ProtoMessageRef(m)
          top += m
        case other => throw new IllegalArgumentException(s"unexpected token '$other'")
      }
    }
    top.toSeq
  }

  /** The message to decode against: `messageName` if given, else the first
    * top-level message in the file. */
  def messageFor(protoText: String, messageName: Option[String] = None): ProtoMessage = {
    val msgs = parseProtoFile(protoText)
    require(msgs.nonEmpty, "no message in proto text")
    messageName match {
      case Some(n) => msgs.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"message $n not found"))
      case None => msgs.head
    }
  }
}
