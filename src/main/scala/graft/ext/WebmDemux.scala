package graft.ext

/** Pure-JVM WebM/Matroska (EBML) container demuxer — the Matroska
  * counterpart of [[Mp4Demux]]. Walks the EBML element tree
  * (`Segment > Cluster > SimpleBlock | BlockGroup > Block`) and extracts
  * each block's codec payload (e.g. VP8/VP9/Opus frames) with its track
  * number. Container-level only, like Mp4Demux: bitstream decode of the
  * extracted frames needs a codec library and stays behind
  * [[Multimodal.MediaDecoder]].
  *
  * EBML primer: every element is `[varint id][varint size][payload]`.
  * Varints carry their length in the leading zero bits of the first
  * byte; element IDs keep the marker bit, sizes strip it. An all-ones
  * size payload means "unknown size" (streamed segments) — treated as
  * extending to the end of the enclosing range.
  *
  * All paths are total: corrupt/truncated/non-EBML bytes yield empty
  * results, never exceptions — one bad payload must not kill a stage.
  */
object WebmDemux {

  private val EbmlHeader = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Cluster = 0x1F43B675L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val Block = 0xA1L

  /** One demuxed block: the track it belongs to and its codec payload. */
  final case class MediaBlock(trackNumber: Long, payload: Array[Byte])

  /** Parsed element id at `p`: (id with marker, bytes consumed), or None
    * on malformed/truncated input. */
  private def readId(b: Array[Byte], p: Int, end: Int): Option[(Long, Int)] = {
    if (p >= end) return None
    val first = b(p) & 0xff
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 4 || p + len > end) return None
    var v = first.toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    Some((v, len))
  }

  /** Parsed element size at `p`: (size or -1 for "unknown", bytes
    * consumed). Size varints strip the marker bit. */
  private def readSize(b: Array[Byte], p: Int, end: Int): Option[(Long, Int)] = {
    if (p >= end) return None
    val first = b(p) & 0xff
    if (first == 0) return None
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || p + len > end) return None
    var v = (first & (0xff >>> len)).toLong
    var allOnes = (first & (0xff >>> len)) == (0xff >>> len)
    var i = 1
    while (i < len) {
      val x = b(p + i) & 0xffL
      allOnes &&= x == 0xffL
      v = (v << 8) | x
      i += 1
    }
    Some((if (allOnes) -1L else v, len))
  }

  /** Iterate child elements of [from, end), calling `f(id, payloadStart,
    * payloadEnd)`. Unknown-size elements consume the rest of the range. */
  private def walk(b: Array[Byte], from: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var p = from
    while (p < end) {
      val id = readId(b, p, end) match {
        case Some(x) => x
        case None    => return
      }
      val sz = readSize(b, p + id._2, end) match {
        case Some(x) => x
        case None    => return
      }
      val payloadStart = p + id._2 + sz._2
      // a DECLARED size overflowing the enclosing range is corruption —
      // stop the walk rather than clamp (a clamp would emit trailing
      // garbage bytes as a frame payload; same reject-on-overflow rule as
      // Mp4Demux.children). Only the unknown-size marker legitimately
      // extends to the range end (streamed segments).
      if (sz._1 >= 0 && payloadStart + sz._1 > end) return
      val payloadEnd =
        if (sz._1 < 0) end
        else (payloadStart + sz._1).toInt
      f(id._1, payloadStart, payloadEnd)
      if (payloadEnd <= p) return // no forward progress: corrupt
      p = payloadEnd
    }
  }

  /** All media blocks in document order; empty unless the bytes start
    * with an EBML header (the WebM/MKV magic). */
  def blocks(bytes: Array[Byte]): Seq[MediaBlock] = {
    val out = Seq.newBuilder[MediaBlock]
    try {
      readId(bytes, 0, bytes.length) match {
        case Some((EbmlHeader, _)) => ()
        case _                     => return Seq.empty
      }
      // an unknown-size Cluster (streamed captures) clamps to the segment
      // end, so LATER clusters arrive as nested children of the first —
      // recurse on Cluster ids at the block level or their frames vanish.
      // Depth-capped: crafted Cluster-in-Cluster headers cost 5 bytes a
      // level, and StackOverflowError is fatal (escapes NonFatal) — real
      // streams nest a handful deep at most
      def inCluster(cs: Int, ce: Int, depth: Int): Unit =
        if (depth <= 64) walk(bytes, cs, ce) { (bid, bs, be) =>
          if (bid == SimpleBlock) blockPayload(bytes, bs, be).foreach(out += _)
          else if (bid == BlockGroup) walk(bytes, bs, be) { (gid, gs, ge) =>
            if (gid == Block) blockPayload(bytes, gs, ge).foreach(out += _)
          }
          else if (bid == Cluster) inCluster(bs, be, depth + 1)
        }
      walk(bytes, 0, bytes.length) { (id, s, e) =>
        if (id == Segment) walk(bytes, s, e) { (cid, cs, ce) =>
          if (cid == Cluster) inCluster(cs, ce, 0)
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Track-number varint: same length-prefixed encoding as sizes but
    * WITHOUT the all-ones-means-unknown rule — that convention applies
    * only to element sizes, and treating track 127 (0xFF) as "unknown"
    * would silently drop its blocks. */
  private def readTrackNum(b: Array[Byte], p: Int, end: Int): Option[(Long, Int)] = {
    if (p >= end) return None
    val first = b(p) & 0xff
    if (first == 0) return None
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || p + len > end) return None
    var v = (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    Some((v, len))
  }

  /** Block layout: [varint track][2-byte timecode][1-byte flags][frame
    * data]. Lacing (multiple frames per block) is rare in WebM video;
    * laced blocks are emitted whole rather than split. */
  private def blockPayload(b: Array[Byte], s: Int, e: Int): Option[MediaBlock] =
    readTrackNum(b, s, e).flatMap { case (track, tlen) =>
      val dataStart = s + tlen + 3 // timecode (2) + flags (1)
      if (dataStart > e) None
      else Some(MediaBlock(track, java.util.Arrays.copyOfRange(b, dataStart, e)))
    }

  /** `n` evenly-spaced media blocks — [[Mp4Demux.sampleBytes]]'s policy
    * ([[Mp4Demux.evenPicks]]) for the Matroska family. */
  def sampleBytes(payload: Array[Byte], n: Int): Seq[(Int, Array[Byte])] = {
    val all = blocks(payload)
    Mp4Demux.evenPicks(all.length, n).map(i => i -> all(i).payload)
  }
}
