package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO BMFF (MP4/MOV/M4A) container demuxer — no ffmpeg, no
  * native libs. Parses the box tree (`moov/trak/mdia/minf/stbl`) and
  * reconstructs the SAMPLE TABLE — per-sample byte ranges in `mdat` —
  * from `stsz` (sizes), `stsc` (sample→chunk mapping) and `stco`/`co64`
  * (chunk offsets), preferring the first video (`hdlr` = `vide`) track.
  *
  * This is REAL demuxing at the container level: the extracted samples
  * are the track's actual access units (e.g. H.264/HEVC NAL payloads),
  * exactly what an ffmpeg-backed decoder would be handed. Codec
  * BITSTREAM decode (pixels out of an AVC sample) genuinely needs a
  * codec library this container doesn't ship — that one seam stays
  * pluggable via [[Multimodal.MediaDecoder]].
  *
  * Every parse path is total: truncated/corrupt/non-BMFF bytes return
  * `None`/empty rather than throwing, because at 100 TB some payloads
  * are always broken and one bad row must not kill a 10k-task stage.
  */
object Mp4Demux {

  /** Per-sample byte ranges into the original payload. */
  final case class SampleTable(offsets: Array[Long], sizes: Array[Long]) {
    def sampleCount: Int = offsets.length
  }

  private final case class Box(boxType: String, payloadStart: Int, payloadEnd: Int)

  /** Children of the byte range [from, to) parsed as boxes. Stops at the
    * first malformed header rather than guessing. */
  private def children(bytes: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var p = from
    while (p + 8 <= to) {
      val size32 = readU32(bytes, p)
      val typ = new String(bytes, p + 4, 4, "ISO-8859-1")
      var headerLen = 8L
      val boxSize: Long =
        if (size32 == 1L) { // 64-bit largesize
          if (p + 16 > to) return out.result()
          headerLen = 16L
          readU64(bytes, p + 8)
        } else if (size32 == 0L) (to - p).toLong // box extends to end
        else size32
      if (boxSize < headerLen || p + boxSize > to) return out.result()
      out += Box(typ, (p + headerLen).toInt, (p + boxSize).toInt)
      p = (p + boxSize).toInt
    }
    out.result()
  }

  private def readU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def readU64(b: Array[Byte], p: Int): Long =
    ByteBuffer.wrap(b, p, 8).order(ByteOrder.BIG_ENDIAN).getLong

  private def find(bytes: Array[Byte], box: Box, typ: String): Option[Box] =
    children(bytes, box.payloadStart, box.payloadEnd).find(_.boxType == typ)

  /** The track's sample table, preferring the first `vide` handler track,
    * else the first track carrying a complete stbl. */
  def parse(bytes: Array[Byte]): Option[SampleTable] =
    try {
      val top = children(bytes, 0, bytes.length)
      val moov = top.find(_.boxType == "moov").getOrElse(return None)
      val traks = children(bytes, moov.payloadStart, moov.payloadEnd)
        .filter(_.boxType == "trak")
      if (traks.isEmpty) return None
      def handler(trak: Box): String = (for {
        mdia <- find(bytes, trak, "mdia")
        hdlr <- find(bytes, mdia, "hdlr")
        // FullBox: 4 bytes version/flags, 4 bytes pre_defined, then type
        if hdlr.payloadStart + 12 <= hdlr.payloadEnd
      } yield new String(bytes, hdlr.payloadStart + 8, 4, "ISO-8859-1"))
        .getOrElse("")
      val ordered = traks.sortBy(t => if (handler(t) == "vide") 0 else 1)
      ordered.iterator.flatMap(t => sampleTableOf(bytes, t)).buffered
        .headOption
    } catch { case scala.util.control.NonFatal(_) => None }

  private def sampleTableOf(bytes: Array[Byte], trak: Box): Option[SampleTable] = {
    val stbl = for {
      mdia <- find(bytes, trak, "mdia")
      minf <- find(bytes, mdia, "minf")
      stbl <- find(bytes, minf, "stbl")
    } yield stbl
    stbl.flatMap { s =>
      for {
        sizes <- find(bytes, s, "stsz").flatMap(b => parseStsz(bytes, b))
        chunkOffsets <- find(bytes, s, "stco").flatMap(b => parseStco(bytes, b, wide = false))
          .orElse(find(bytes, s, "co64").flatMap(b => parseStco(bytes, b, wide = true)))
        stsc <- find(bytes, s, "stsc").flatMap(b => parseStsc(bytes, b))
        table <- assemble(sizes, chunkOffsets, stsc, bytes.length.toLong)
      } yield table
    }
  }

  private def parseStsz(b: Array[Byte], box: Box): Option[Array[Long]] = {
    val p = box.payloadStart
    if (p + 12 > box.payloadEnd) return None
    val uniform = readU32(b, p + 4)
    val count = readU32(b, p + 8)
    if (count < 0 || count > Int.MaxValue) return None
    val n = count.toInt
    if (uniform != 0) {
      // bound the allocation by what the file could possibly hold — a
      // corrupt count of 2^31-1 must not OOM the executor ("total, never
      // throws" includes OutOfMemoryError, which NonFatal doesn't catch)
      if (uniform * count > b.length.toLong) None
      else Some(Array.fill(n)(uniform))
    } else if (p + 12 + 4L * n > box.payloadEnd) None
    else Some(Array.tabulate(n)(i => readU32(b, p + 12 + 4 * i)))
  }

  private def parseStco(b: Array[Byte], box: Box, wide: Boolean): Option[Array[Long]] = {
    val p = box.payloadStart
    if (p + 8 > box.payloadEnd) return None
    val count = readU32(b, p + 4)
    val w = if (wide) 8 else 4
    if (count < 0 || p + 8 + w.toLong * count > box.payloadEnd) return None
    Some(Array.tabulate(count.toInt)(i =>
      if (wide) readU64(b, p + 8 + 8 * i) else readU32(b, p + 8 + 4 * i)))
  }

  /** stsc entries: (firstChunk 1-based, samplesPerChunk). */
  private def parseStsc(b: Array[Byte], box: Box): Option[Array[(Long, Long)]] = {
    val p = box.payloadStart
    if (p + 8 > box.payloadEnd) return None
    val count = readU32(b, p + 4)
    if (count < 0 || p + 8 + 12L * count > box.payloadEnd) return None
    Some(Array.tabulate(count.toInt)(i =>
      (readU32(b, p + 8 + 12 * i), readU32(b, p + 8 + 12 * i + 4))))
  }

  /** Walk chunks in order, expanding the stsc run-length map, laying
    * samples head-to-tail from each chunk's offset. */
  private def assemble(
      sizes: Array[Long],
      chunkOffsets: Array[Long],
      stsc: Array[(Long, Long)],
      fileLen: Long): Option[SampleTable] = {
    if (sizes.isEmpty || chunkOffsets.isEmpty || stsc.isEmpty) return None
    val offsets = new Array[Long](sizes.length)
    var sample = 0
    var chunk = 0
    var run = 0
    while (chunk < chunkOffsets.length && sample < sizes.length) {
      // advance the stsc run when the next entry starts at this chunk
      while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk + 1) run += 1
      val perChunk = stsc(run)._2
      var off = chunkOffsets(chunk)
      var i = 0L
      while (i < perChunk && sample < sizes.length) {
        // overflow-safe bound: `off + size > fileLen` wraps negative for
        // huge co64 offsets and would let the corrupt range through to an
        // uncaught copyOfRange in sampleBytes
        if (off < 0 || sizes(sample) < 0 || off > fileLen - sizes(sample))
          return None // corrupt table
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < sizes.length) None // table shorter than declared samples
    else Some(SampleTable(offsets, sizes))
  }

  /** `n` evenly-spaced pick indices out of `total` — the one sampling
    * policy every container demuxer shares (see [[WebmDemux]]). */
  private[ext] def evenPicks(total: Int, n: Int): Seq[Int] =
    if (total <= 0 || n <= 0) Seq.empty
    else (0 until math.min(n, total))
      .map(i => (total.toLong * i / math.min(n, total)).toInt)
      .distinct

  /** `n` evenly-spaced samples (by index) out of the payload — the frame-
    * sampling policy of [[Multimodal.sampleFramesExploded]], but on REAL
    * container samples. Empty on anything unparseable. */
  def sampleBytes(payload: Array[Byte], n: Int): Seq[(Int, Array[Byte])] =
    parse(payload) match {
      case None => Seq.empty
      case Some(t) =>
        evenPicks(t.sampleCount, n).map { si =>
          si -> java.util.Arrays.copyOfRange(
            payload, t.offsets(si).toInt, (t.offsets(si) + t.sizes(si)).toInt)
        }
    }
}
