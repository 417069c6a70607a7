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

  /** Deterministic fake: hash-derived pseudo-features. Replace with an
    * ImageIO/ffmpeg-backed implementation where those libraries exist —
    * nothing else in the pipeline changes. */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    override def decode(modality: String, content: Array[Byte]): Array[Float] = {
      val seed = java.util.Arrays.hashCode(content) ^ modality.hashCode
      val rnd = new scala.util.Random(seed)
      Array.fill(dim)(rnd.nextFloat())
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

  /** "Resize" stub: records the target size in metadata and truncates the
    * payload deterministically (a real impl re-encodes pixels; the
    * metadata/columnar contract is identical). */
  def resizeStub(df: DataFrame, width: Int, height: Int,
      contentCol: String = "content"): DataFrame =
    df.withColumn("meta",
        col("meta").withField("width", lit(width)).withField("height", lit(height)))
      .withColumn(contentCol,
        substring(col(contentCol), lit(1),
          least(length(col(contentCol)), lit(width * height))))

  /** Frame sampling stub for video payloads: split the byte stream into
    * `nFrames` equal slices and explode to a (media_id, frame_idx, frame)
    * table — the real impl swaps the slicer for a container-format
    * demuxer; the exploded-frames layout, ids, and ordering are the
    * production shape. */
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
