package graft.cdc

import graft.codec.{AvroSchemaConverter, ConfluentWireFormat, SchemaRegistryClient}
import graft.codec.AvroExpressions
import graft.conf.{GraftSettings, Layer}
import graft.lake.{FsUtils, LakePath, TableRef}
import graft.streaming.IncrementalRunner
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The three medallion pipeline stages + the Kafka reverse path —
  * the algorithmic core of the reference (`jibaro/datalake/cdc.py`,
  * `avro_handler.py`, `kafka.py`), re-expressed Spark-first:
  *
  *  - `kafkaToRaw`: Structured Streaming, run-to-drain (`AvailableNow`),
  *    binary passthrough into the raw layer.
  *  - `rawToStaged`: incremental batches, per-(keySchemaId, valueSchemaId)
  *    decode slices with a literal schema each — native `FromAvro`
  *    expression, FAILFAST.
  *  - `stagedToCurated`: latest-per-key dedup, per-schema-pair split, CDC
  *    MERGE-apply into a versioned table, compaction, history, vacuum.
  *  - `dataframeToKafka`: curated state -> registered schema -> framed
  *    payloads -> bus.
  */
object CdcPipelines {

  // ------------------------------------------------------- kafka -> raw

  /** Bus topic -> raw layer, verbatim frames (`cdc.py:15-51`). Streaming
    * with checkpoint in the control bucket; `AvailableNow` drains then
    * stops, the incremental-batch model every reference pipeline uses.
    *
    * `options` are merged into the source, caller-wins — the reference
    * merges `**kwargs` over its defaults the same way (`cdc.py:29-38`),
    * and its `maxOffsetsPerTrigger=100000` rate cap maps to the bus's
    * per-trigger cap here (`maxFilesPerTrigger` on the file-backed bus). */
  def kafkaToRaw(
      spark: SparkSession,
      bus: MessageBus,
      topic: String,
      project: String,
      database: String,
      table: String,
      options: Map[String, String] = Map.empty)(implicit s: GraftSettings): Unit = {
    val ref = TableRef(Layer.Raw, project, database, table)
    val q = bus.readStream(spark, topic, options)
      .writeStream
      .format("parquet")
      .option("path", LakePath.data(ref))
      .option("checkpointLocation", LakePath.checkpoint(ref))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ------------------------------------------------------- raw -> staged

  /** Decode one raw batch: split by distinct (keySchemaId, valueSchemaId),
    * decode each slice against its literal registry schema, append to the
    * staged table with schema merge (`avro_handler.py:12-96`). */
  private[cdc] def decodeConfluentBatch(
      batch: DataFrame,
      codec: PayloadCodec,
      registry: SchemaRegistryClient,
      staged: GraftTable): Unit = {
    // Debezium emits tombstones (null value) after deletes for log
    // compaction; they carry no envelope (the delete arrives as an op='d'
    // record) and would NPE the schema-id extraction — drop them here.
    val withIds = batch
      .filter(col("value").isNotNull)
      .withColumn("keySchemaId",
        when(col("key").isNull, lit(null).cast("int"))
          .otherwise(ConfluentWireFormat.schemaId(col("key"))))
      .withColumn("valueSchemaId", ConfluentWireFormat.schemaId(col("value")))

    // distinct schema pairs to the driver — one decode job per pair, so
    // each `from_avro` sees exactly one literal schema (`cdc.py:151-176`)
    val pairs = withIds.select("keySchemaId", "valueSchemaId").distinct()
      .orderBy(asc_nulls_last("keySchemaId"), asc_nulls_last("valueSchemaId"))
      .collect()

    pairs.foreach { row =>
      val keyId = if (row.isNullAt(0)) None else Some(row.getInt(0))
      val valueId = row.getInt(1)
      val slice = withIds.filter(
        (keyId match {
          case Some(id) => col("keySchemaId") === id
          case None     => col("keySchemaId").isNull
        }) && col("valueSchemaId") === valueId)

      def schemaText(id: Int): String = registry.getById(id)
        .getOrElse(throw new IllegalStateException(s"schema id $id not in registry"))
        .schema

      val keyCol = keyId match {
        case Some(id) => codec.decode(codec.payload(col("key")), schemaText(id)).as("key")
        // keyless topic: a TYPED null (binary) — a NullType column would be
        // unwritable as parquet
        case None     => lit(null).cast("binary").as("key")
      }
      val decoded = slice.select(
        keyCol,
        codec.decode(codec.payload(col("value")), schemaText(valueId)).as("value"),
        col("topic"), col("partition"), col("offset"), col("timestamp"),
        col("timestampType"), col("keySchemaId"), col("valueSchemaId"))
      staged.append(decoded)
    }
  }

  /** Raw layer -> staged table, incrementally (`cdc.py:54-88` dispatch +
    * `avro_handler.py:99-138` loop). Reads the raw parquet stream with a
    * file-source checkpoint, decodes per micro-batch. */
  def rawToStaged(
      spark: SparkSession,
      project: String,
      database: String,
      table: String,
      codec: PayloadCodec,
      registry: SchemaRegistryClient)(implicit s: GraftSettings): Unit = {
    val rawRef = TableRef(Layer.Raw, project, database, table)
    val stagedRef = TableRef(Layer.Staged, project, database, table)
    val staged = GraftTable(spark, LakePath.data(stagedRef))
    val q = spark.readStream
      .schema(MessageBus.FrameSchema)
      .option("maxFilesPerTrigger", "1000")
      .parquet(LakePath.data(rawRef))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        decodeConfluentBatch(batch, codec, registry, staged)
      }
      .option("checkpointLocation", LakePath.checkpoint(stagedRef))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // --------------------------------------------------- staged -> curated

  /** Apply one staged batch to the curated table (`cdc.py:127-217`):
    * latest-per-key dedup -> per-schema-pair slices -> bootstrap overwrite
    * or MERGE-semantics upsert (after-images upserted, before-images of
    * deletes removed). */
  private[cdc] def applyCdcBatch(batch: DataFrame, curated: GraftTable,
      curatedBuckets: Int = 0): Unit = {
    if (batch.isEmpty) return
    // latest event per primary key; offset desc tie-break makes the result
    // deterministic where the reference relied on timestamp alone
    // (`cdc.py:132-142`)
    val deduped = graft.ext.Dedup.latestPerKey(
      batch, Seq("key"), Seq(col("timestamp").desc, col("offset").desc))

    val pairs = deduped.select("keySchemaId", "valueSchemaId").distinct()
      .orderBy(asc_nulls_last("keySchemaId"), asc_nulls_last("valueSchemaId"))
      .collect()

    pairs.foreach { row =>
      val slice = deduped.filter(
        (if (row.isNullAt(0)) col("keySchemaId").isNull
         else col("keySchemaId") === row.getInt(0)) &&
          (if (row.isNullAt(1)) col("valueSchemaId").isNull
           else col("valueSchemaId") === row.getInt(1)))

      val keyType = slice.schema("key").dataType
      require(keyType.isInstanceOf[StructType],
        s"CDC apply requires a keyed topic (struct key); got $keyType — keyless " +
          "topics have no primary key to merge on")
      val keyFields = keyType.asInstanceOf[StructType].fieldNames.toSeq
      if (!curated.exists) {
        // first write: only insertable images (`cdc.py:178-187`); declare
        // the bucketed layout on the PK so steady-state merges are
        // bucket-pruned
        if (curatedBuckets > 0) curated.setBucketSpec(keyFields, curatedBuckets)
        curated.overwrite(
          slice.filter("value.op != 'd'").select(col("value.after.*"), col("value.op")))
      } else {
        val upserts = slice.filter("value.op != 'd'")
          .select(col("value.after.*"), col("value.op"))
        val deletes = slice.filter("value.op = 'd'")
          .select(col("value.before.*"), col("value.op"))
        curated.upsert(upserts.unionByName(deletes), keyFields, "op",
          deleteOp = "d", keepOpColumn = true)
      }
    }
  }

  /** Staged -> curated with checkpointed incremental consumption,
    * compaction, history metrics, and periodic vacuum (`cdc.py:91-269`). */
  def stagedToCurated(
      spark: SparkSession,
      project: String,
      database: String,
      table: String)(implicit s: GraftSettings): Unit = {
    val stagedRef = TableRef(Layer.Staged, project, database, table)
    val curatedRef = TableRef(Layer.Curated, project, database, table)
    val staged = GraftTable(spark, LakePath.data(stagedRef))
    val curated = GraftTable(spark, LakePath.data(curatedRef))
    val checkpoint = LakePath.checkpoint(curatedRef)

    // re-bootstrap: curated output missing -> drop checkpoint, reprocess all
    // (`cdc.py:117-119`)
    if (!curated.exists) IncrementalRunner.deleteCheckpoint(spark, checkpoint)

    IncrementalRunner.runOnce(spark, staged, checkpoint) { batch =>
      applyCdcBatch(batch, curated, s.curatedBuckets)
      curated.compactIfNeeded()
      // external-reader manifest after every merge (`cdc.py:261-262`)
      if (curated.exists) curated.writeManifest()
      // history metrics for observability (`cdc.py:220-247`)
      val historyTable = GraftTable(spark, LakePath.history(curatedRef))
      historyTable.append(curated.history().limit(1))
      // vacuum every Nth version (`cdc.py:264-269`)
      if (curated.version % s.vacuumEveryNVersions == 0) curated.vacuum()
    }
  }

  // ------------------------------------------------------ curated -> bus

  /** DataFrame -> registered-schema framed Kafka records -> bus
    * (`jibaro/datalake/kafka.py:22-119`): split columns into key/value
    * structs, register schemas (Avro or Protobuf, like the reference's
    * `type="AVRO"|"PROTOBUF"` switch), wire-format-frame the encoded
    * payloads, publish. */
  def dataframeToKafka(
      spark: SparkSession,
      source: DataFrame,
      topic: String,
      keyColumns: Seq[String],
      registry: SchemaRegistryClient,
      bus: MessageBus,
      contentType: String = "avro"): Unit = {
    val valueColumns = source.columns.filterNot(keyColumns.contains).toSeq
    require(valueColumns.nonEmpty, "no value columns left after key split")
    // record/message names must be bare identifiers; topics carry dots
    val recName = topic.replaceAll("[^A-Za-z0-9_]", "_")

    def framed(cols: Seq[String], role: String): org.apache.spark.sql.Column = {
      val structType = StructType(cols.map(c => source.schema(c)))
      val structCol = struct(cols.map(col): _*)
      contentType match {
        case "avro" =>
          val schema = AvroSchemaConverter.toAvroSchema(structType, s"${recName}_$role")
          val id = registry.register(s"$topic-$role", schema.toString)
          ConfluentWireFormat.frame(
            AvroExpressions.to_avro(structCol, schema.toString), id)
        case "protobuf" =>
          val proto = graft.codec.ProtoSchemaGen.protoFile(structType, s"${recName}_$role")
          val id = registry.register(s"$topic-$role", proto, schemaType = "PROTOBUF")
          ConfluentWireFormat.frame(
            graft.codec.ProtobufExpressions.to_protobuf(structCol), id, protobuf = true)
        case other =>
          throw new IllegalArgumentException(
            s"contentType must be avro|protobuf, got '$other'")
      }
    }

    val valueCol = framed(valueColumns, "value")
    val keyCol =
      if (keyColumns.isEmpty) lit(null).cast("binary").as("key")
      else framed(keyColumns, "key").as("key")
    bus.publish(spark, topic, source.select(keyCol, valueCol.as("value")))
  }
}
