package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode/feature-extract/resize/frame-sample stages.
  *
  * The Spark-side plumbing here is REAL and tested — schema, partitioning,
  * batch-iterator decode shape, feature-column layout. The byte-level
  * media decoding itself is pluggable ([[MediaDecoder]]); this container
  * ships no image/audio libraries, so [[StubDecoder]] provides a
  * deterministic fake with the exact signature a JNI/ImageIO/ffmpeg-backed
  * decoder drops into.
  *
  * Scale notes (100 TB of media):
  *  - media rows are WIDE (MBs): always `select` away `content` before any
  *    shuffle-bearing op; features/metadata travel, payloads don't;
  *  - decode runs partition-local via `mapPartitions` (one decoder init per
  *    partition, batch-iterator shape — the JVM analogue of mapInPandas);
  *  - size-bucketed repartitioning keeps decode tasks balanced when a few
  *    videos dwarf millions of thumbnails.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", MetaType)))

  /** Partition-local batch decode: the real-decoder integration point.
    * One decoder per partition, lazily applied across the row iterator —
    * the batch shape that amortizes native-lib init. */
  trait MediaDecoder extends Serializable {
    /** Decode one payload to a fixed-size feature vector. */
    def decode(modality: String, content: Array[Byte]): Array[Float]
    def dim: Int
  }

  /** Deterministic fake: hash-derived pseudo-features. Useful when results
    * must be reproducible outside the JVM (no codec in the loop) and for
    * modalities [[JdkMediaDecoder]] cannot parse (video containers). */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    override def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val seed = java.util.Arrays.hashCode(content) ^ modality.hashCode
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat())
    }
  }

  /** REAL byte-level decoder on JDK-native codecs — zero external
    * dependencies: `javax.imageio` for images (PNG/JPEG/BMP/GIF),
    * `javax.sound.sampled` for audio containers (WAV/AIFF/AU).
    *
    * Features are a fixed `grid x grid` vector: images -> mean luminance
    * per cell in [0,1] (a tiny perceptual thumbnail — enough for exact and
    * near-dup detection on re-encoded images); audio -> RMS energy per
    * time segment of the first channel. Corrupt/unknown payloads decode to
    * EMPTY features (callers filter on `size(features) > 0`) rather than
    * failing the task — at 100 TB some payloads are always broken, and one
    * bad row must not kill a 10k-task stage. Video containers need a
    * demuxer the JDK lacks; pair [[sampleFramesExploded]] with an
    * ffmpeg-backed [[MediaDecoder]] in environments that ship one. */
  final class JdkMediaDecoder(grid: Int = 4) extends MediaDecoder {
    override val dim: Int = grid * grid

    override def decode(modality: String, content: Array[Byte]): Array[Float] =
      try modality match {
        case "image" => decodeImage(content)
        case "audio" => decodeAudio(content)
        case _       => Array.empty
      } catch { case scala.util.control.NonFatal(_) => Array.empty }

    private def decodeImage(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) return Array.empty
      val out = new Array[Float](dim)
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val x0 = img.getWidth * gx / grid
          val x1 = math.max(img.getWidth * (gx + 1) / grid, x0 + 1)
          val y0 = img.getHeight * gy / grid
          val y1 = math.max(img.getHeight * (gy + 1) / grid, y0 + 1)
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1 && y < img.getHeight) {
            var x = x0
            while (x < x1 && x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
              n += 1; x += 1
            }
            y += 1
          }
          out(gy * grid + gx) = if (n == 0) 0f else (sum / n).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }

    private def decodeAudio(bytes: Array[Byte]): Array[Float] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return Array.empty // PCM16 only
        val raw = in.readAllBytes()
        val frameSize = fmt.getFrameSize
        val nFrames = raw.length / frameSize
        if (nFrames == 0) return Array.empty
        val out = new Array[Float](dim)
        val big = fmt.isBigEndian
        var seg = 0
        while (seg < dim) {
          val f0 = nFrames.toLong * seg / dim
          val f1 = math.max(nFrames.toLong * (seg + 1) / dim, f0 + 1)
          var sumSq = 0.0; var n = 0
          var f = f0
          while (f < f1 && f < nFrames) {
            val i = (f * frameSize).toInt // first channel of the frame
            val s =
              if (big) ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort
              else ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort
            sumSq += (s / 32768.0) * (s / 32768.0)
            n += 1; f += 1
          }
          out(seg) = if (n == 0) 0f else math.sqrt(sumSq / n).toFloat
          seg += 1
        }
        out
      } finally in.close()
    }
  }

  /** Attach a `features array<float>` column by running the decoder
    * partition-locally. Narrow transformation — no shuffle. */
  def withDecodedFeatures(
      df: DataFrame,
      decoder: MediaDecoder,
      contentCol: String = "content",
      modalityCol: String = "modality",
      out: String = "features"): DataFrame = {
    val schema = df.schema.add(out, ArrayType(FloatType, containsNull = false))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { rows =>
      // decoder is initialized once per partition (captured + reused)
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentCol)
        val modality = r.getAs[String](modalityCol)
        val feats: Array[Float] =
          if (content == null) Array.empty[Float]
          else decoder.decode(modality, content)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
  }

  /** Pure-expression pseudo-featurizer (no decoder object): deterministic
    * hash features, fully codegen'd — useful to exercise downstream vector
    * ops (dedup/ANN) against binary columns without any media lib. */
  def hashFeatures(content: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(10000)).cast("double") / 10000.0).cast("float"))

  /** REAL image resize via JDK Graphics2D, re-encoded as PNG, run
    * partition-locally (narrow, no shuffle; payloads never leave their
    * partition). `meta.width/height/mime` are updated for re-encoded rows;
    * payloads ImageIO cannot parse pass through UNCHANGED — broken bytes
    * cost nothing, never a task. */
  def resizeImages(df: DataFrame, width: Int, height: Int,
      contentCol: String = "content", metaCol: String = "meta"): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    val ci = df.schema.fieldIndex(contentCol)
    val mi = if (df.columns.contains(metaCol)) df.schema.fieldIndex(metaCol) else -1
    val metaType =
      if (mi >= 0) df.schema(mi).dataType.asInstanceOf[StructType] else null
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](ci)
        val resized =
          if (bytes == null) None
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else {
              val scaled = new java.awt.image.BufferedImage(
                width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, width, height, null)
              } finally g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", baos)
              Some(baos.toByteArray)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        resized match {
          case Some(b) =>
            var seq = r.toSeq.updated(ci, b)
            if (mi >= 0 && !r.isNullAt(mi)) {
              val m = r.getStruct(mi)
              var ms = m.toSeq
              ms = ms.updated(metaType.fieldIndex("width"), width)
              ms = ms.updated(metaType.fieldIndex("height"), height)
              ms = ms.updated(metaType.fieldIndex("mime"), "image/png")
              seq = seq.updated(mi, Row.fromSeq(ms))
            }
            Row.fromSeq(seq)
          case None => r
        }
      }
    }
  }

  /** "Resize" stub: records the target size in metadata and truncates the
    * payload deterministically — kept for payloads with no JDK codec
    * (video); images use the real [[resizeImages]]. */
  def resizeStub(df: DataFrame, width: Int, height: Int,
      contentCol: String = "content"): DataFrame =
    df.withColumn("meta",
        col("meta").withField("width", lit(width)).withField("height", lit(height)))
      .withColumn(contentCol,
        substring(col(contentCol), lit(1),
          least(length(col(contentCol)), lit(width * height))))

  /** REAL container demux for multi-frame formats the JDK ships a reader
    * for (animated GIF; TIFF stacks): decode up to `nFrames` frames sampled
    * evenly across the container, re-encoded as PNG, exploded to a
    * (media_id, frame_idx, frame) table — the same output shape as
    * [[sampleFramesExploded]], with real pixels.
    *
    * Runs partition-local (`mapPartitions`, one reader per payload, no
    * shuffle; payloads never leave their partition). Frames are decoded
    * raw per index — GIF inter-frame disposal compositing is NOT applied,
    * so delta-encoded GIFs yield the delta region only (full-frame GIFs,
    * the common training-data case, are exact). Payloads with no JDK
    * multi-frame reader or corrupt bytes yield ZERO rows rather than a
    * failed task — at 100 TB some payloads are always broken. Containers
    * needing a real demuxer (mp4/webm) still pair [[sampleFramesExploded]]
    * with an ffmpeg-backed decoder. */
  def demuxFramesExploded(df: DataFrame, nFrames: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else demuxOne(bytes, nFrames).zipWithIndex.map { case (png, i) =>
          Row(r.get(0), i, png)
        }
      }
    }
  }

  /** REAL mp4/mov demux via the pure-JVM ISO BMFF parser ([[Mp4Demux]]):
    * up to `nFrames` evenly-sampled SAMPLES (codec access units — e.g.
    * H.264 NAL payloads) extracted from the container's sample table,
    * exploded to (media_id, sample_idx, sample_bytes, sample_size). This
    * replaces the byte-slicing placeholder with actual container
    * structure: the emitted bytes are exactly what an ffmpeg/JNI-backed
    * [[MediaDecoder]] would be handed for pixel decode (the one step that
    * genuinely needs a codec library this container doesn't ship).
    *
    * Same scale shape as [[demuxFramesExploded]]: partition-local
    * mapPartitions, payloads never shuffled, corrupt/non-BMFF payloads
    * yield zero rows rather than failed tasks. */
  def demuxMp4Exploded(df: DataFrame, nFrames: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame =
    demuxSamplesExploded(df, idCol, contentCol, Mp4Demux.sampleBytes(_, nFrames))

  /** REAL WebM/Matroska demux via the pure-JVM EBML parser
    * ([[WebmDemux]]): up to `nFrames` evenly-sampled media BLOCKS (codec
    * payloads — e.g. VP8/VP9 frames, Opus packets) extracted from the
    * container's cluster tree, exploded to the same output shape as
    * [[demuxMp4Exploded]] (media_id, sample_idx, sample_bytes,
    * sample_size) so downstream decode plumbing is container-agnostic.
    *
    * Same scale shape as the other demuxers: partition-local
    * mapPartitions, payloads never shuffled, corrupt/non-EBML payloads
    * yield zero rows rather than failed tasks. */
  def demuxWebmExploded(df: DataFrame, nFrames: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame =
    demuxSamplesExploded(df, idCol, contentCol, WebmDemux.sampleBytes(_, nFrames))

  /** Shared container-demux explode: one row per sampled codec payload,
    * (id, sample_idx, sample_bytes, sample_size). Partition-local;
    * null/corrupt payloads (sampler returns empty) yield zero rows. */
  private def demuxSamplesExploded(df: DataFrame, idCol: String,
      contentCol: String,
      sampler: Array[Byte] => Seq[(Int, Array[Byte])]): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("sample_bytes", BinaryType, nullable = false),
      StructField("sample_size", LongType, nullable = false)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else sampler(bytes).map { case (si, sample) =>
          Row(r.get(0), si, sample, sample.length.toLong)
        }
      }
    }
  }

  /** Evenly-sampled decoded frames of one multi-frame payload, PNG bytes;
    * empty on corrupt/unsupported input. */
  private def demuxOne(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val total = reader.getNumImages(true)
          if (total <= 0) return Seq.empty
          val picks = (0 until math.min(nFrames, total))
            .map(i => total.toLong * i / math.min(nFrames, total))
            .map(_.toInt).distinct
          picks.flatMap { fi =>
            try {
              val img = reader.read(fi)
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", baos)
              Some(baos.toByteArray)
            } catch { case scala.util.control.NonFatal(_) => None }
          }
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Frame sampling stub for video payloads: split the byte stream into
    * `nFrames` equal slices and explode to a (media_id, frame_idx, frame)
    * table — the real impl swaps the slicer for a container-format
    * demuxer (see [[demuxFramesExploded]] for the JDK-native containers);
    * the exploded-frames layout, ids, and ordering are the production
    * shape. */
  def sampleFramesExploded(df: DataFrame, nFrames: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val len = length(col(contentCol))
    val frameLen = greatest(len / nFrames, lit(1))
    df.select(col(idCol),
        posexplode(
          transform(sequence(lit(0), lit(nFrames - 1)),
            i => substring(col(contentCol), (i * frameLen + 1).cast("int"), frameLen.cast("int"))))
          .as(Seq("frame_idx", "frame")))
  }

  /** Size-bucketed repartition: balances decode tasks by payload size class
    * so one 4 GB video doesn't straggle a partition of thumbnails. */
  def repartitionBySize(df: DataFrame, partitions: Int,
      contentCol: String = "content"): DataFrame =
    df.withColumn("__size_bucket",
        ceil(log2(greatest(length(col(contentCol)).cast("long"), lit(1L)))))
      .repartition(partitions, col("modality"), col("__size_bucket"))
      .drop("__size_bucket")
}
