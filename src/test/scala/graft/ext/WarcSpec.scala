package graft.ext

import graft.SparkSpecBase
import graft.ext.Warc.WarcRecord
import java.nio.charset.StandardCharsets.UTF_8

class WarcSpec extends SparkSpecBase {
  import spark.implicits._

  private def rec(i: Int, body: String) = WarcRecord(
    warcType = "response",
    recordId = s"<urn:test:$i>",
    targetUri = s"http://example.com/$i",
    contentType = "text/plain",
    warcDate = "2026-01-01T00:00:00Z",
    payload = body.getBytes(UTF_8))

  test("round-trip: gzip-per-record and plain byte streams") {
    val recs = (0 until 5).map(i => rec(i, s"payload body $i " * (i + 1)))
    for (gz <- Seq(true, false)) {
      val bytes = Warc.write(recs.iterator, gzipPerRecord = gz)
      val back = Warc.records(bytes)
      assert(back.length === 5)
      back.zip(recs).foreach { case (b, o) =>
        assert(b.warcType === o.warcType)
        assert(b.recordId === o.recordId)
        assert(b.targetUri === o.targetUri)
        assert(b.contentType === o.contentType)
        assert(b.warcDate === o.warcDate)
        assert(b.payload.toSeq === o.payload.toSeq)
      }
    }
  }

  test("binary-safe payloads and empty payloads survive the framing") {
    val bin = WarcRecord("resource", "<urn:b>", "http://e/b", "application/octet-stream",
      "", Array[Byte](0, 13, 10, 13, 10, -1, 127)) // embedded CRLFCRLF bytes
    val empty = WarcRecord("warcinfo", "", "", "", "", Array.emptyByteArray)
    val back = Warc.records(Warc.write(Iterator(bin, empty)))
    assert(back.length === 2)
    assert(back(0).payload.toSeq === bin.payload.toSeq)
    assert(back(1).payload.isEmpty)
  }

  test("corrupt input is total: garbage, truncation, bad lengths") {
    assert(Warc.records(null) === Seq.empty)
    assert(Warc.records(Array.emptyByteArray) === Seq.empty)
    assert(Warc.records("not a warc at all\r\n\r\n".getBytes(UTF_8)) === Seq.empty)
    assert(Warc.records(Array.fill[Byte](64)(0x41)) === Seq.empty)
    // valid record followed by a truncated one: the good record survives
    val good = Warc.write(Iterator(rec(1, "hello")), gzipPerRecord = false)
    val truncated = "WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8)
    assert(Warc.records(good ++ truncated).map(_.targetUri) === Seq("http://example.com/1"))
    // truncated gzip tail after a full member
    val gzGood = Warc.write(Iterator(rec(2, "hi")), gzipPerRecord = true)
    val gzBroken = gzGood ++ gzGood.take(10)
    assert(Warc.records(gzBroken).map(_.targetUri) === Seq("http://example.com/2"))
    // corrupt member HEADER after a full member: earlier members survive
    val gzBadHeader = gzGood ++ Array.fill[Byte](16)(0x7e)
    assert(Warc.records(gzBadHeader).map(_.targetUri) === Seq("http://example.com/2"))
  }

  test("recordsExploded: partition-local explode, corrupt rows drop") {
    val a = Warc.write(Iterator(rec(1, "alpha"), rec(2, "beta")))
    val df = Seq((1L, a), (2L, Array.fill[Byte](32)(0x55)))
      .toDF("file_id", "content")
    val out = Warc.recordsExploded(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(4), r.getLong(8)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq(
      (1L, 0, "http://example.com/1", 5L),
      (1L, 1, "http://example.com/2", 4L)))
  }
}
