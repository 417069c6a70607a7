package graft.api

import graft.conf.GraftSettings
import graft.lake.{LakePath, TableRef}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Layered-lake read/write API.
  *
  * The reference exposes this surface by *subclassing* PySpark's
  * `DataFrameReader`/`DataFrameWriter`/`SparkSession` and monkey-patching
  * `dataframe.__class__` (`jibaro/spark/readwriter.py:14-117`,
  * `jibaro/spark/dataframe.py:7-17`). On the JVM the idiomatic equivalent is
  * extension methods: `import graft.api.lake._` gives
  * `spark.readLake(...)`, `df.writeLake(...)`, `spark.readStreamLake(...)`,
  * `ds.writeStreamLake(...)` without touching Spark's classes — this
  * survives Spark upgrades and keeps every DataFrame a plain DataFrame.
  */
object lake {

  /** Path-based formats routed through the layer->bucket mount; anything
    * else (kafka, jdbc, ...) is non-path and handled by its own source
    * (reference whitelist at `readwriter.py:71`). */
  val PathFormats: Set[String] =
    Set("parquet", "json", "orc", "csv", "text", "graft")

  implicit final class GraftSessionOps(private val spark: SparkSession) extends AnyVal {

    /** Batch read by 4-tuple (reference `readwriter.py:57-117`). Non-path
      * formats (kafka, jdbc, ...) fall through to a plain `load()` with the
      * caller's options, exactly as the reference does past its whitelist
      * (`readwriter.py:57-81`) — the layer mount only applies to formats
      * addressed by path. */
    def readLake(
        ref: TableRef,
        format: String = "parquet",
        options: Map[String, String] = Map.empty
    )(implicit s: GraftSettings): DataFrame =
      if (format == "graft") graft.tables.GraftTable(spark, LakePath.data(ref)).read()
      else if (PathFormats.contains(format))
        spark.read.options(options).format(format).load(LakePath.data(ref))
      else spark.read.options(options).format(format).load()

    /** Streaming read by 4-tuple (reference `streaming.py:9-51`). File
      * streams need an explicit schema in Spark; pass it via options-free
      * overload below or let the caller provide a schema-carrying reader. */
    def readStreamLake(
        ref: TableRef,
        format: String = "parquet",
        schema: Option[org.apache.spark.sql.types.StructType] = None,
        options: Map[String, String] = Map.empty
    )(implicit s: GraftSettings): DataFrame = {
      val r0 = spark.readStream.options(options).format(format)
      val r = schema.map(r0.schema).getOrElse(r0)
      // non-path formats (kafka, rate, ...) fall through to a plain load()
      // (reference `streaming.py:9-51` mirrors the batch whitelist)
      if (PathFormats.contains(format)) r.load(LakePath.data(ref)) else r.load()
    }
  }

  implicit final class GraftWriteOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Batch write by 4-tuple (reference `readwriter.py:14-54`). */
    def writeLake(
        ref: TableRef,
        format: String = "parquet",
        mode: String = "overwrite",
        options: Map[String, String] = Map.empty
    )(implicit s: GraftSettings): Unit =
      if (format == "graft") {
        val table = graft.tables.GraftTable(ds.sparkSession, LakePath.data(ref))
        mode match {
          case "append"                          => table.append(ds.toDF())
          case "overwrite"                       => table.overwrite(ds.toDF())
          case other =>
            throw new IllegalArgumentException(s"graft format supports append/overwrite, got '$other'")
        }
      } else ds.write.mode(mode).options(options).format(format).save(LakePath.data(ref))
  }

  implicit final class GraftStreamWriteOps[T](private val w: DataStreamWriter[T]) {

    /** Streaming start by 4-tuple with auto-injected checkpoint: when the
      * caller has not set `checkpointLocation`, derive it from the control
      * bucket (reference `streaming.py:54-65`). */
    def startLake(
        ref: TableRef,
        options: Map[String, String] = Map.empty
    )(implicit s: GraftSettings): StreamingQuery = {
      val withOpts = w.options(options)
      val withCkpt =
        if (options.contains("checkpointLocation")) withOpts
        else withOpts.option("checkpointLocation", LakePath.checkpoint(ref))
      withCkpt.start(LakePath.data(ref))
    }
  }
}
