package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
        Row("image/png", 100, 50, null, null)),
      Row(2L, "audio", Array[Byte](9, 8, 7, 6, 5, 4),
        Row("audio/wav", null, null, 16000, 2000L)),
      Row(3L, "video", (1 to 100).map(_.toByte).toArray,
        Row("video/mp4", 640, 480, null, 60000L)),
      Row(4L, "image", null, Row("image/png", 1, 1, null, null))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
  }

  test("withDecodedFeatures: partition-local decode, stable dim, null-safe") {
    val decoder = new Multimodal.StubDecoder(dim = 16)
    val out = Multimodal.withDecodedFeatures(mediaDf, decoder)
    val feats = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).size === 16)
    assert(feats(4L).isEmpty) // null payload -> empty features, no crash
    // deterministic: same bytes -> same features
    val again = Multimodal.withDecodedFeatures(mediaDf, decoder)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === again)
  }

  test("hashFeatures: codegen'd pseudo-features usable by vector ops") {
    val out = mediaDf.filter(col("content").isNotNull)
      .withColumn("features", Multimodal.hashFeatures(col("content"), 8))
    val collected = out.select("media_id", "features").collect()
    assert(collected.forall(_.getSeq[Float](1).size === 8))
    assert(collected.forall(_.getSeq[Float](1).forall(f => f >= 0f && f < 1f)))
    // downstream vector op composes directly
    val sims = out.as("a").join(out.as("b"), col("a.media_id") < col("b.media_id"))
      .select(Similarity.cosine(col("a.features"), col("b.features")).as("c"))
    assert(sims.count() === 3)
  }

  // --- real JDK codecs: generate a PNG and a WAV in-process ---

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if (x < w / 2) rgb else 0x000000) // left half colored, right black
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def wavBytes(nSamples: Int, loud: Boolean): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    val amp = if (loud) 16000 else 100
    for (i <- 0 until nSamples) {
      val s = (math.sin(i * 0.3) * amp).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("JdkMediaDecoder: real PNG luminance grid and WAV RMS features") {
    val rows = Seq(
      Row(1L, "image", pngBytes(32, 32, 0xffffff), Row("image/png", 32, 32, null, null)),
      Row(2L, "audio", wavBytes(8000, loud = true), Row("audio/wav", null, null, 8000, 1000L)),
      Row(3L, "audio", wavBytes(8000, loud = false), Row("audio/wav", null, null, 8000, 1000L)),
      Row(4L, "image", Array[Byte](1, 2, 3), Row("image/png", 1, 1, null, null)) // corrupt
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val out = Multimodal.withDecodedFeatures(df, new Multimodal.JdkMediaDecoder(grid = 4))
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val img = out(1L)
    assert(img.size === 16)
    // left half white (lum ~1), right half black (~0): grid columns 0-1 vs 2-3
    assert(img(0) > 0.9f && img(1) > 0.9f, s"left cells bright: $img")
    assert(img(2) < 0.1f && img(3) < 0.1f, s"right cells dark: $img")

    val loud = out(2L); val quiet = out(3L)
    assert(loud.size === 16 && quiet.size === 16)
    assert(loud.sum > quiet.sum * 10, "RMS tracks amplitude")

    assert(out(4L).isEmpty, "corrupt payload -> empty features, not a crash")
  }

  test("resizeImages: real re-encode to target size, corrupt rows pass through") {
    val rows = Seq(
      Row(1L, "image", pngBytes(64, 48, 0x336699), Row("image/png", 64, 48, null, null)),
      Row(2L, "image", Array[Byte](9, 9, 9), Row("image/png", 1, 1, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.MediaSchema)
    val out = Multimodal.resizeImages(df, 16, 16).collect()
      .map(r => r.getLong(0) -> r).toMap

    val good = out(1L)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(good.getAs[Array[Byte]]("content")))
    assert(decoded.getWidth === 16 && decoded.getHeight === 16)
    val meta = good.getStruct(good.fieldIndex("meta"))
    assert(meta.getInt(meta.fieldIndex("width")) === 16)
    assert(meta.getString(meta.fieldIndex("mime")) === "image/png")

    // corrupt payload untouched, meta untouched
    assert(out(2L).getAs[Array[Byte]]("content").toSeq === Seq[Byte](9, 9, 9))
    val m2 = out(2L).getStruct(out(2L).fieldIndex("meta"))
    assert(m2.getInt(m2.fieldIndex("width")) === 1)
  }

  test("multimodal features compose with similarity: re-encodes are near-dups") {
    // two renditions of the same image (original + resized re-encode) and
    // one inverted image: luminance-grid features feed cosine directly
    val orig = pngBytes(64, 64, 0xcc8833) // left half colored, right black
    val flipped = { // RIGHT half colored — orthogonal luminance layout
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64)
        img.setRGB(x, y, if (x >= 32) 0xffffff else 0x000000)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      Row(1L, "image", orig, Row("image/png", 64, 64, null, null)),
      Row(3L, "image", flipped, Row("image/png", 64, 64, null, null)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      Multimodal.MediaSchema)
    // rendition 2 = real resize of the original through the real decoder
    val resized = Multimodal.resizeImages(
      df.filter(col("media_id") === 1L), 32, 32)
      .withColumn("media_id", lit(2L))
    val feats = Multimodal.withDecodedFeatures(
        df.unionByName(resized), new Multimodal.JdkMediaDecoder(grid = 4))
      .filter(size(col("features")) > 0)
      .select(col("media_id"), col("features"))
    val sims = feats.as("a").join(feats.as("b"), col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        Similarity.cosine(col("a.features"), col("b.features")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((1L, 2L)) > 0.99, s"re-encode should match original: $sims")
    assert(sims((1L, 3L)) < sims((1L, 2L)), s"unrelated image less similar: $sims")
  }

  test("resizeStub rewrites metadata and bounds payload") {
    val out = Multimodal.resizeStub(mediaDf.filter(col("content").isNotNull), 4, 2)
    val metas = out.select(col("meta.width"), col("meta.height"), length(col("content"))).collect()
    assert(metas.forall(r => r.getInt(0) === 4 && r.getInt(1) === 2 && r.getInt(2) <= 8))
  }

  test("sampleFramesExploded yields ordered fixed-count frames") {
    val frames = Multimodal.sampleFramesExploded(
      mediaDf.filter(col("modality") === "video"), nFrames = 4)
    val collected = frames.orderBy("frame_idx").collect()
    assert(collected.length === 4)
    assert(collected.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3))
    assert(collected.forall(_.getAs[Array[Byte]](2).length === 25))
  }

  /** In-process animated GIF: `rgbs.length` full frames of solid color. */
  private def animatedGifBytes(w: Int, h: Int, rgbs: Seq[Int]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    rgbs.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("demuxFramesExploded: real animated-GIF frames decode with true pixels") {
    // 6 solid-color frames; sample 3 — expect real, distinct pixel data
    val colors = Seq(0x000000, 0x333333, 0x666666, 0x999999, 0xcccccc, 0xffffff)
    val gif = animatedGifBytes(8, 8, colors)
    val df = Seq((1L, "video", gif), (2L, "video", Array.empty[Byte]))
      .toDF("media_id", "modality", "content")
    val frames = Multimodal.demuxFramesExploded(df, nFrames = 3)
      .orderBy("media_id", "frame_idx").collect()
    // corrupt payload (id 2) yields zero rows, never a failed task
    assert(frames.forall(_.getLong(0) === 1L))
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    // each exploded frame is a REAL image: PNG-decodable at original size,
    // mean luminance strictly increasing across the sampled frames
    val lums = frames.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img.getWidth === 8 && img.getHeight === 8)
      (img.getRGB(4, 4) & 0xff).toDouble
    }
    assert(lums.sliding(2).forall(p => p(0) < p(1)),
      s"sampled frames should progress through the animation: ${lums.toSeq}")
  }

  test("demuxFramesExploded: single-frame PNG demuxes to one real frame") {
    val df = Seq((7L, "image", pngBytes(6, 6, 0x336699)))
      .toDF("media_id", "modality", "content")
    val frames = Multimodal.demuxFramesExploded(df, nFrames = 4).collect()
    assert(frames.length === 1 && frames.head.getInt(1) === 0)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames.head.getAs[Array[Byte]](2)))
    assert((img.getRGB(1, 3) & 0xffffff) === 0x336699) // colored left half
  }

  test("repartitionBySize keeps all rows and drops the helper column") {
    val out = Multimodal.repartitionBySize(mediaDf.filter(col("content").isNotNull), 4)
    assert(out.count() === 3)
    assert(!out.columns.contains("__size_bucket"))
  }

  // ------------------------------------------------------- MP4 demux

  /** Minimal valid ISO BMFF file: ftyp + mdat(samples) + moov carrying a
    * vide trak whose stsz/stsc/stco describe the mdat layout. */
  private def buildMp4(samples: Seq[Array[Byte]],
      chunkSizes: Seq[Int]): Array[Byte] = {
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      ByteBuffer.allocate(payload.length + 8).putInt(payload.length + 8)
        .put(typ.getBytes("ISO-8859-1")).put(payload).array()
    def u32(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * vs.length); vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ u32(Seq(0L)) ++ "isom".getBytes)
    val mdat = box("mdat", samples.reduce(_ ++ _))
    // chunk offsets: samples laid head-to-tail from the mdat payload start,
    // split into chunks of chunkSizes samples
    val mdatPayloadOff = ftyp.length + 8
    val sampleOffsets = samples.scanLeft(mdatPayloadOff.toLong)(_ + _.length)
    val chunkFirstSample = chunkSizes.scanLeft(0)(_ + _)
    val chunkOffsets = chunkFirstSample.init.map(sampleOffsets(_))
    val stsz = box("stsz", u32(Seq(0L, 0L, samples.length.toLong)) ++
      u32(samples.map(_.length.toLong)))
    val stsc = box("stsc", u32(Seq(0L, chunkSizes.length.toLong)) ++
      u32(chunkSizes.zipWithIndex.flatMap { case (n, i) =>
        Seq((i + 1).toLong, n.toLong, 1L) }))
    val stco = box("stco", u32(Seq(0L, chunkOffsets.length.toLong)) ++
      u32(chunkOffsets))
    val hdlr = box("hdlr", u32(Seq(0L, 0L)) ++ "vide".getBytes ++
      new Array[Byte](13))
    val stbl = box("stbl", stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  test("Mp4Demux: sample table reconstructed across multi-chunk stsc runs") {
    val samples = Seq(
      Array.fill[Byte](3)(1), Array.fill[Byte](4)(2), Array.fill[Byte](5)(3),
      Array.fill[Byte](6)(4), Array.fill[Byte](7)(5))
    // 2 chunks: 3 samples then 2 — exercises the stsc run expansion
    val mp4 = buildMp4(samples, chunkSizes = Seq(3, 2))
    val t = Mp4Demux.parse(mp4).getOrElse(fail("parse returned None"))
    assert(t.sampleCount === 5)
    assert(t.sizes.toSeq === Seq(3L, 4L, 5L, 6L, 7L))
    // every reconstructed range must slice out the original sample bytes
    samples.zipWithIndex.foreach { case (s, i) =>
      val got = mp4.slice(t.offsets(i).toInt, (t.offsets(i) + t.sizes(i)).toInt)
      assert(got.toSeq === s.toSeq, s"sample $i bytes differ")
    }
  }

  test("Mp4Demux.sampleBytes picks evenly and survives garbage") {
    val samples = (0 until 5).map(i => Array.fill[Byte](4)((i + 1).toByte))
    val mp4 = buildMp4(samples, chunkSizes = Seq(5))
    val picked = Mp4Demux.sampleBytes(mp4, 3)
    assert(picked.map(_._1) === Seq(0, 1, 3)) // floor(5i/3)
    assert(picked.forall { case (i, b) => b.toSeq === samples(i).toSeq })
    assert(Mp4Demux.sampleBytes(Array.fill[Byte](64)(0x42), 3).isEmpty)
    assert(Mp4Demux.sampleBytes(Array.emptyByteArray, 3).isEmpty)
  }

  // ------------------------------------------------------ WebM demux

  /** Minimal Matroska: EBML header + Segment{Cluster{SimpleBlocks,
    * BlockGroup{Block}}}. 1-byte sizes suffice for test payloads. */
  private def buildWebm(frames: Seq[Array[Byte]]): Array[Byte] = {
    def el(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      idBytes ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    def simpleBlock(frame: Array[Byte]): Array[Byte] =
      el(Array[Byte](0xA3.toByte), Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++ frame)
    val header = el(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), Array[Byte](1))
    val blockGroup = el(Array[Byte](0xA0.toByte),
      el(Array[Byte](0xA1.toByte), Array[Byte](0x81.toByte, 0, 0, 0) ++ frames.last))
    val cluster = el(Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75.toByte),
      frames.init.flatMap(simpleBlock).toArray ++ blockGroup)
    val segment = el(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67.toByte), cluster)
    header ++ segment
  }

  test("WebmDemux: SimpleBlocks and grouped Blocks extract in order") {
    val frames = (0 until 4).map(i => Array.fill[Byte](5)((0x20 + i).toByte))
    val webm = buildWebm(frames)
    val got = WebmDemux.blocks(webm)
    assert(got.length === 4)
    assert(got.forall(_.trackNumber === 1L))
    got.zip(frames).foreach { case (b, f) => assert(b.payload.toSeq === f.toSeq) }
    val picked = WebmDemux.sampleBytes(webm, 2)
    assert(picked.map(_._1) === Seq(0, 2))
    assert(WebmDemux.blocks(Array.fill[Byte](40)(0x55)).isEmpty)
    assert(WebmDemux.blocks(Array.emptyByteArray).isEmpty)
  }

  test("WebmDemux: unknown-size cluster doesn't swallow followers; track 127 decodes") {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    val f1 = Array.fill[Byte](4)(0x61)
    val f2 = Array.fill[Byte](4)(0x62)
    // track 127 encodes as the all-ones 1-byte varint 0xFF — a SIZE would
    // mean "unknown", but a track number must decode as 127
    val sb1 = el(Array[Byte](0xA3.toByte),
      Array[Byte](0xFF.toByte, 0, 0, 0) ++ f1)
    val cluster2 = el(Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75.toByte),
      el(Array[Byte](0xA3.toByte), Array[Byte](0x81.toByte, 0, 0, 0) ++ f2))
    // cluster 1 with UNKNOWN size (0xFF): clamps to segment end, so
    // cluster 2 arrives nested inside its range and must still demux
    val cluster1 = Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75.toByte, 0xFF.toByte) ++
      sb1 ++ cluster2
    val header = el(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), Array[Byte](1))
    val segment = el(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67.toByte), cluster1)
    val got = WebmDemux.blocks(header ++ segment)
    assert(got.length === 2, s"expected both clusters' blocks, got ${got.length}")
    assert(got(0).trackNumber === 127L)
    assert(got(0).payload.toSeq === f1.toSeq)
    assert(got(1).trackNumber === 1L)
    assert(got(1).payload.toSeq === f2.toSeq)
  }

  test("demuxMp4Exploded: real container samples out, corrupt rows drop") {
    val samples = (0 until 4).map(i => Array.fill[Byte](8)((0x10 + i).toByte))
    val df = Seq(
      (1L, buildMp4(samples, chunkSizes = Seq(4))),
      (2L, Array.fill[Byte](32)(0x7f))) // not BMFF -> zero rows
      .toDF("media_id", "content")
    val out = Multimodal.demuxMp4Exploded(df, nFrames = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq, r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(out.map(x => (x._1, x._2)).toSeq === Seq((1L, 0), (1L, 2)))
    assert(out.forall { case (_, si, bytes, sz) =>
      bytes == samples(si).toSeq && sz == 8L })
  }

  test("demuxWebmExploded: real container blocks out, corrupt rows drop") {
    val frames = (0 until 4).map(i => Array.fill[Byte](5)((0x30 + i).toByte))
    val df = Seq(
      (1L, buildWebm(frames)),
      (2L, Array.fill[Byte](32)(0x7f))) // not EBML -> zero rows
      .toDF("media_id", "content")
    val out = Multimodal.demuxWebmExploded(df, nFrames = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq, r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // same output shape as demuxMp4Exploded: (media_id, sample_idx,
    // sample_bytes, sample_size), even picks over the block sequence
    assert(out.map(x => (x._1, x._2)).toSeq === Seq((1L, 0), (1L, 2)))
    assert(out.forall { case (_, si, bytes, sz) =>
      bytes == frames(si).toSeq && sz == 5L })
  }

  test("WebmDemux: declared size overflowing its range is rejected, not clamped") {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    val f1 = Array.fill[Byte](4)(0x61)
    val good = el(Array[Byte](0xA3.toByte), Array[Byte](0x81.toByte, 0, 0, 0) ++ f1)
    // a SimpleBlock declaring 0x40 payload bytes with only garbage left in
    // the cluster: a clamp would emit the trailing bytes as a frame
    val truncated = Array[Byte](0xA3.toByte, (0x80 | 0x40).toByte, 0x7f, 0x7f, 0x7f)
    val cluster = el(Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75.toByte), good ++ truncated)
    val header = el(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte), Array[Byte](1))
    val segment = el(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67.toByte), cluster)
    val got = WebmDemux.blocks(header ++ segment)
    assert(got.length === 1, s"truncated block must be dropped, got ${got.length}")
    assert(got(0).payload.toSeq === f1.toSeq)
  }
}
