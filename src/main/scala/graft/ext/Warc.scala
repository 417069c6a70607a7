package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pure-JVM WARC (ISO 28500) reader/writer — the standard container for
  * crawl-scale pretraining corpora (Common Crawl et al.) and the one
  * first-class LLM-pipeline SOURCE beside parquet/json/kafka. Same
  * design rules as [[Mp4Demux]]/[[WebmDemux]]: container structure
  * parsed in plain JVM code, all paths total (corrupt/truncated input
  * yields the records parsed so far, never a failed task), payloads
  * never shuffled — [[recordsExploded]] is a partition-local explode.
  *
  * Format essentials: a WARC file is a sequence of records, each
  * `WARC/1.x CRLF header-lines CRLF CRLF payload CRLF CRLF`; the payload
  * length comes from the mandatory `Content-Length` header. Crawl
  * archives gzip each record as its OWN gzip member so readers can split
  * at member boundaries; multi-member gzip and plain byte streams both
  * parse here (JVM `GZIPInputStream` walks concatenated members).
  *
  * Scale shape: one WARC file = one binary payload row (`spark.read
  * .format("binaryFile")` or any bytes column); records explode
  * partition-locally, so a 1000-executor cluster parses 100 TB of
  * archives with zero shuffle — downstream filtering/dedup picks up
  * from the exploded records.
  */
object Warc {

  /** One WARC record: the standard headers plus the raw payload. */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      contentType: String,
      warcDate: String,
      payload: Array[Byte])

  // ------------------------------------------------------------ writing

  /** Serialize records as WARC/1.0. `gzipPerRecord=true` (the crawl
    * standard) wraps every record in its own gzip member. */
  def write(records: Iterator[WarcRecord], gzipPerRecord: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      // header values are CRLF-sanitized: a crawled URI containing a raw
      // "\r\n" would otherwise inject forged header lines and shift the
      // record framing (attacker-controlled payload bytes parsed as
      // subsequent records — silent archive forgery)
      def clean(v: String): String = v.replaceAll("[\r\n]", " ")
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: ${clean(r.warcType)}\r\n")
      if (r.recordId.nonEmpty) head.append(s"WARC-Record-ID: ${clean(r.recordId)}\r\n")
      if (r.targetUri.nonEmpty) head.append(s"WARC-Target-URI: ${clean(r.targetUri)}\r\n")
      if (r.warcDate.nonEmpty) head.append(s"WARC-Date: ${clean(r.warcDate)}\r\n")
      if (r.contentType.nonEmpty) head.append(s"Content-Type: ${clean(r.contentType)}\r\n")
      head.append(s"Content-Length: ${r.payload.length}\r\n\r\n")
      val recordBytes = head.toString.getBytes(UTF_8) ++ r.payload ++ "\r\n\r\n".getBytes(UTF_8)
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(recordBytes)
        gz.finish()
        // close() releases the native Deflater deterministically (finish()
        // alone leaves it to GC — a native-memory leak at millions of
        // records per task); closing the shared BAOS underneath is a no-op
        gz.close()
      } else out.write(recordBytes)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ parsing

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    // size HINT only (BAOS grows): the long math + cap avoids the Int
    // overflow a `length * 4` would hit on ~512 MB+ archives (a negative
    // capacity throws, and records() would silently drop the whole file)
    val out = new ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, 64L * 1024 * 1024).toInt)
    val buf = new Array[Byte](64 * 1024)
    // hard cap just under the JVM array limit: a valid archive
    // decompressing past ~2 GB would otherwise OOM-Error the task (an
    // Error the totality handlers below cannot catch). At the cap the
    // tail is dropped exactly like a truncated archive — records parsed
    // so far serve; >2 GB archives belong split upstream (Common Crawl
    // caps members at ~1 GB compressed for exactly this reason).
    val cap = 2000000000
    try {
      var n = in.read(buf)
      while (n >= 0 && out.size() < cap) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      // truncated/corrupt trailing member (EOF mid-stream, bad member
      // header or CRC): keep what decompressed — the parser below drops
      // any half-record tail
      case _: EOFException        => ()
      case _: java.io.IOException => ()
    } finally in.close()
    out.toByteArray
  }

  /** All records in a WARC byte buffer (plain or multi-member gzip).
    * Total: malformed/truncated content yields the records parsed before
    * the corruption, non-WARC bytes yield none. */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length == 0) return Seq.empty
    val plain =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        try gunzipAll(bytes) catch { case scala.util.control.NonFatal(_) => return Seq.empty }
      else bytes
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    val n = plain.length
    def lineEnd(from: Int): Int = { // index of CR in the closing CRLF, or -1
      var i = from
      while (i + 1 < n && !(plain(i) == '\r' && plain(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    while (p < n) {
      // skip inter-record CRLFs
      while (p + 1 < n && plain(p) == '\r' && plain(p + 1) == '\n') p += 2
      if (p >= n) return out.result()
      // version line
      val ve = lineEnd(p)
      if (ve < 0) return out.result()
      val version = new String(plain, p, ve - p, UTF_8)
      if (!version.startsWith("WARC/")) return out.result()
      p = ve + 2
      // header lines until the blank separator
      var headers = Map.empty[String, String]
      var done = false
      while (!done) {
        val he = lineEnd(p)
        if (he < 0) return out.result()
        if (he == p) { p += 2; done = true } // blank line
        else {
          val line = new String(plain, p, he - p, UTF_8)
          val idx = line.indexOf(':')
          if (idx > 0)
            headers += line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim
          p = he + 2
        }
      }
      val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || p + len > n) return out.result() // truncated payload: stop
      val payload = java.util.Arrays.copyOfRange(plain, p, (p + len).toInt)
      p = (p + len).toInt
      out += WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("content-type", ""),
        headers.getOrElse("warc-date", ""),
        payload)
    }
    out.result()
  }

  // ------------------------------------------------------------ operator

  /** Explode WARC file payloads to one row per record:
    * (idCol, record_idx, warc_type, record_id, target_uri, content_type,
    * warc_date, payload, payload_len). Partition-local — archive bytes
    * never cross a shuffle; null/corrupt payloads yield zero rows. Pair
    * with `spark.read.format("binaryFile")` over a directory of
    * `.warc.gz` files for archive ingestion. */
  def recordsExploded(df: DataFrame,
      idCol: String = "file_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("record_idx", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("record_id", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("warc_date", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("payload_len", LongType, nullable = false)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        records(bytes).iterator.zipWithIndex.map { case (rec, i) =>
          Row(r.get(0), i, rec.warcType, rec.recordId, rec.targetUri,
            rec.contentType, rec.warcDate, rec.payload, rec.payload.length.toLong)
        }
      }
    }
  }
}
