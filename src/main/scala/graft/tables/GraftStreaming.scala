package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DataType, StructType}

import graft.conf.GraftSettings

/** Stream offsets ARE commit versions — the table's log is already a
  * totally-ordered, replayable sequence, so the source needs no state of
  * its own. (Deserialized offsets arrive as `SerializedOffset(json)`;
  * every shape round-trips through `json.toLong`.) */
private[tables] final case class GraftOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** `spark.readStream.format("graft")` — tail a [[GraftTable]]'s commit
  * log as a micro-batch stream (Delta's streaming-source semantics):
  *
  *  - each micro-batch is the files ADDED by the commits in the offset
  *    range — O(new data), the log is never diffed against a snapshot;
  *  - `dataChange=false` commits (compaction, clustering) are invisible,
  *    exactly as incremental consumers require;
  *  - the FIRST batch of a fresh stream is the table's CURRENT SNAPSHOT
  *    (Delta's default — live files at the stream's first offset, so
  *    rewrites buried in history are irrelevant); the tail after it is
  *    pure log commits;
  *  - a REWRITE commit in the tailed range (upsert/delete/update/
  *    overwrite/restore — anything that removed live files) fails the
  *    stream loudly unless `.option("ignoreChanges", "true")`, which then
  *    emits the rewritten files' rows (possibly re-delivering unchanged
  *    neighbours — the documented Delta `ignoreChanges` contract;
  *    downstream must be idempotent by key);
  *  - `.option("startingVersion", v)` REPLACES the snapshot start with a
  *    log replay of the commits from v on — INCLUSIVE of v itself, the
  *    Delta convention (1 = full history).
  *
  * The schema is pinned at stream start (the log schema); files written
  * before an additive evolution read the missing columns as NULL.
  */
private[tables] final class GraftStreamSource(
    table: GraftTable,
    options: Map[String, String])(implicit settings: GraftSettings)
  extends Source {

  private val opts = options.map { case (k, v) => k.toLowerCase -> v }
  private val ignoreChanges = opts.get("ignorechanges").exists(_.toBoolean)
  private val startingVersion = opts.get("startingversion").map(_.toLong)

  override val schema: StructType = GraftStreamSource.schemaOf(table)

  override def getOffset: Option[Offset] = {
    val v = table.version
    // with an inclusive startingVersion sv there is data as soon as v >= sv
    if (v == 0L || startingVersion.exists(v < _)) None else Some(GraftOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = end.json.toLong
    val files = (start, startingVersion) match {
      case (None, None) =>
        // fresh stream, no explicit start: the snapshot at the first
        // offset IS the first batch — history rewrites are irrelevant
        table.liveFiles(asOf = endV)
      case (s, sv) =>
        // resumed offsets are exclusive bounds; the user-facing
        // startingVersion is INCLUSIVE (Delta convention), so shift it
        val startV = s.map(_.json.toLong).orElse(sv.map(_ - 1L)).getOrElse(0L)
        val range = table.commits()
          .filter(c => c.version > startV && c.version <= endV && c.dataChange)
        val rewrites = range.filter(_.remove.nonEmpty)
        if (rewrites.nonEmpty && !ignoreChanges)
          throw new IllegalStateException(
            s"streaming source found rewrite commit(s) " +
              s"${rewrites.map(c => s"v${c.version}(${c.action})").mkString(", ")} " +
              s"in ${table.path} — appends-only is the streaming contract; pass " +
              "option ignoreChanges=true to stream rewritten files (rows may re-deliver)")
        range.flatMap(_.add)
    }
    val paths = files.map(f => s"${table.path}/$f")
    val spark = table.spark
    val batch =
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(paths: _*)
    StreamBridge.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}

private[tables] object GraftStreamSource {
  def schemaOf(table: GraftTable): StructType = {
    val sj = table.currentSchemaJson.getOrElse(throw new IllegalStateException(
      s"cannot stream from a table that does not exist yet: ${table.path}"))
    DataType.fromJson(sj).asInstanceOf[StructType]
  }
}

/** `writeStream.format("graft")` — each micro-batch appends as ONE commit
  * carrying (queryKey, batchId) in its metrics, and a replayed batch id
  * (at-least-once redelivery after a crash between the commit and the
  * checkpoint write) is recognized from the log and skipped: the
  * commit-log twin of the (checkpoint, txn) dance every exactly-once sink
  * does. Append mode only — Complete/Update belong to `foreachBatch`
  * compositions where the merge semantics are explicit. */
private[tables] final class GraftStreamSink(
    table: GraftTable,
    fallbackKey: String)(implicit settings: GraftSettings)
  extends Sink {

  /** The txn key is the STREAMING QUERY ID when available (set as a local
    * property by the stream execution thread): it lives INSIDE the
    * checkpoint, so deleting the checkpoint to reprocess mints a new id
    * and the old batch-id stamps stop matching — keying on the checkpoint
    * PATH instead would silently skip every replayed batch id after a
    * reset. The constructor key (checkpointLocation) is only the fallback
    * for direct harness calls outside a stream thread. */
  private def queryKey(spark: org.apache.spark.sql.SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse(fallbackKey)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val key = queryKey(data.sparkSession)
    // batch ids are monotonic per query, so only the NEWEST commit
    // carrying our key matters — O(distance to our last commit), not
    // O(history), per micro-batch
    val replayed = table.exists && table.commits().reverseIterator
      .find(_.metrics.get(GraftStreamSink.QueryKey).contains(key))
      .flatMap(_.metrics.get(GraftStreamSink.BatchKey))
      .exists(_.toLong >= batchId)
    if (replayed) return
    table.append(StreamBridge.asBatchFrame(data),
      extraMetrics = Map(
        GraftStreamSink.QueryKey -> key,
        GraftStreamSink.BatchKey -> batchId.toString))
  }
}

private[tables] object GraftStreamSink {
  val QueryKey = "streamQueryKey"
  val BatchKey = "streamBatchId"

  def keyFrom(parameters: Map[String, String]): String =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("checkpointLocation") => v
    }.getOrElse(throw new IllegalArgumentException(
      // a silent shared fallback key would make two queries writing the
      // same table dedup each other's batch ids — refuse instead
      "graft sink requires .option(\"checkpointLocation\", ...) — the " +
        "location keys the exactly-once (queryKey, batchId) transaction"))

  def requireAppend(outputMode: OutputMode): Unit =
    if (outputMode != OutputMode.Append()) throw new IllegalArgumentException(
      s"graft sink supports Append output mode only (got $outputMode) — " +
        "use foreachBatch with GraftTable.upsert/overwrite for Update/Complete")
}
