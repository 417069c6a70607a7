package graft.tables

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Coalesce, EvalMode, Literal, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector sidecars — row-level deletes WITHOUT file rewrites
  * (Delta's deletion-vector architecture).
  *
  * A DV is the sorted set of 0-based ROW POSITIONS of one parquet data
  * file that are logically deleted. It lives in a write-once sidecar
  * under `<table>/_graft_dv/` and is bound to its data file by the commit
  * log (`Commit.dvs: file -> sidecar`); the data file itself stays
  * byte-identical. Readers drop the marked rows INSIDE the scan by
  * pairing each row with the parquet reader's native row index
  * ([[GraftParquetFileFormat]]), so at 100 TB a 0.1% scattered delete is
  * one scan of the affected files plus KB-sized sidecars — instead of
  * rewriting nearly every touched file through the write path.
  *
  * Encoding: `GDV1` magic, varint row count, varint-delta-encoded sorted
  * positions — 1-2 bytes per deleted row for clustered deletes, ≤9 worst
  * case (RoaringBitmap would be the jar-available upgrade; this format is
  * self-contained and write-once so it can swap later). Sidecars are
  * IMMUTABLE: a second delete on the same file writes a NEW sidecar with
  * the merged position set and re-binds the file in its commit, so
  * readers of older versions keep their bitmaps (time travel works) and
  * superseded sidecars age out through `vacuum`. */
private[tables] object DeletionVectors {

  val Dir = "_graft_dv"

  /** Sentinel value in a commit's `dvs` map meaning "this file's DV is
    * CLEARED" (restore to a pre-delete version re-binds to nothing). */
  val Cleared = ""

  def write(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      positions: Array[Long]): String = {
    require(positions.nonEmpty, "refusing to write an empty deletion vector")
    val name = s"$Dir/dv-${java.util.UUID.randomUUID()}.bin"
    val p = new Path(tablePath, name)
    fs.mkdirs(p.getParent)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, false)))
    try {
      out.writeInt(0x47445631) // "GDV1"
      writeVarLong(out, positions.length.toLong)
      var prev = -1L
      positions.foreach { pos =>
        require(pos > prev, s"positions must be strictly increasing ($prev -> $pos)")
        writeVarLong(out, pos - prev)
        prev = pos
      }
    } finally out.close()
    name
  }

  def read(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
      name: String): Array[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(new Path(tablePath, name))))
    try {
      require(in.readInt() == 0x47445631, s"not a graft deletion vector: $name")
      val n = readVarLong(in).toInt
      val out = new Array[Long](n)
      var prev = -1L
      var i = 0
      while (i < n) {
        prev += readVarLong(in)
        out(i) = prev
        i += 1
      }
      out
    } finally in.close()
  }

  /** Union of two sorted position arrays (sorted, distinct). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length || j < b.length) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  private def writeVarLong(out: java.io.DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.writeByte(v.toInt)
  }

  private def readVarLong(in: java.io.DataInputStream): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val b = in.readByte()
      v |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v // unreachable
  }

  /** Drop DV-marked rows from `df` — the PLAN-LEVEL apply for reads the
    * engine assembles itself (`readAt`, DML scans, the streaming
    * snapshot batch), where the frame is a direct parquet read and the
    * file-source `_metadata` column is resolvable. An anti-join against
    * the exploded (file, position) set: tiny DVs broadcast, a giant one
    * degrades to a shuffle instead of OOMing — and it is pure DataFrame
    * API, so the whole thing stays inside codegen. The HOT path (the
    * native relation / `format("graft")`) does NOT pay this join: it
    * filters inside the scan via [[GraftParquetFileFormat]] with O(1)
    * bitmap probes. `dvByFile` must cover exactly the files in the scan
    * that have DVs; keys are LOG names (table-relative paths).
    * `qualifiedRoots` is the table root as qualified URI strings (every
    * authority rendering the listing may have produced) — rows match on
    * their table-RELATIVE path, not their basename, so on a converted
    * tree a nested `k=v/part-X.parquet` never inherits a DV bound to a
    * flat file that happens to share its basename. */
  def filterDeleted(df: DataFrame, spark: SparkSession,
      dvByFile: Map[String, Array[Long]], qualifiedRoots: Seq[String]): DataFrame = {
    if (dvByFile.isEmpty) return df
    import spark.implicits._
    val dead = dvByFile.iterator
      .flatMap { case (f, ps) => ps.iterator.map(p => (f, p)) }
      .toSeq.toDF("__dv_file", "__dv_pos")
    // `_metadata.file_path` is the URI rendering of the scanned file;
    // DV-bearing names are engine-generated (URL-safe ASCII), so the
    // relative slice compares exactly ([[GraftTable.relNameColumn]]).
    df.withColumn("__dv_f", GraftTable.relNameColumn(qualifiedRoots))
      .withColumn("__dv_i", col("_metadata.row_index"))
      .join(dead, col("__dv_f") === col("__dv_file") && col("__dv_i") === col("__dv_pos"),
        "left_anti")
      .drop("__dv_f", "__dv_i")
  }
}

/** Executor-side DV cache: sidecars load lazily, once per executor, only
  * for files a task actually scans — DV I/O is O(scanned files), never
  * O(table), and pruned-away files never load their bitmaps. */
private[tables] object DvCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def get(tablePath: String, name: String, conf: Configuration): Array[Long] = {
    val key = s"$tablePath/$name"
    val hit = cache.get(key)
    if (hit != null) return hit
    val fs = new Path(tablePath).getFileSystem(conf)
    val loaded = DeletionVectors.read(fs, tablePath, name)
    if (cache.size > 4096) cache.clear() // sidecars are immutable; refetch is safe
    cache.put(key, loaded)
    loaded
  }
}

/** A `Configuration` that survives task serialization (Hadoop's own is
  * not `Serializable`; Spark's wrapper is `private[spark]`). */
private[tables] final class SerializableHadoopConf(
    @transient var conf: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** [[ParquetFileFormat]] that applies deletion vectors INSIDE the scan —
  * the architecture Delta uses for DV reads, and what makes
  * `format("graft")` / [[GraftTable.readRelation]] correct on a
  * DV-bearing snapshot with zero plan-level machinery:
  *
  *  - the parquet reader is asked for its native ROW INDEX column (the
  *    same `ROW_INDEX_TEMPORARY_COLUMN_NAME` plumbing that serves
  *    `_metadata.row_index`, correct under splits and row-group
  *    skipping);
  *  - each task binary-searches its file's bitmap per row (O(log dv)
  *    probes against an executor-cached sorted array) and strips the
  *    borrowed column before handing rows up;
  *  - files WITHOUT a DV pass through at full speed, and a snapshot with
  *    no DVs at all never instantiates this class (the relation builder
  *    keeps vanilla [[ParquetFileFormat]], so whole-stage codegen and
  *    columnar batches are untouched on the common path).
  *
  * Row-based delivery (`supportBatch = false`) is the price on DV-bearing
  * snapshots — the same trade Delta makes; OPTIMIZE purges the DVs and
  * restores the vectorized path.
  *
  * The same in-scan wrapper also serves PARTITION-CONVERTED trees
  * (`dirKeys` non-empty): a file adopted from a hive `k=v/` layout
  * carries the partition columns in its PATH, not its pages, so the
  * reader patches each requested dir-derived column per file — page
  * value coalesced with the path value, exactly
  * [[GraftTable.withDirPartitionColumns]]'s semantics, because later DML
  * rewrites stage FLAT files that carry the columns as data and the two
  * layouts coexist in one table. The patch is one `Coalesce` projection
  * built once per file task; flat files skip it entirely. Row-based
  * delivery again (a per-row value cannot be patched into a shared
  * `ColumnarBatch`); one OPTIMIZE/overwrite flattens the layout and
  * restores vanilla vectorized scans. */
private[tables] final class GraftParquetFileFormat(
    val tablePath: String,
    val dvPaths: Map[String, String],
    /** the STORED log schema when column mapping is active — drives the
      * logical→physical rewrite of requested schemas AT EVERY LEVEL
      * (nested leaves included); the rows a parquet reader returns are
      * POSITIONAL, so asking for the physical names is the entire
      * read-side implementation of column mapping. */
    val mappedSchema: Option[StructType] = None,
    /** dir-derived partition columns of a partition-converted tree, in
      * DIRECTORY ORDER (depth i = key i) with their log-schema types;
      * empty for every table that never adopted a hive tree. Partition
      * columns can never be renamed while nested files are live (DDL
      * refuses), so these names are identical in logical and physical
      * space — no interaction with `mappedSchema`. */
    val dirKeys: Seq[StructField] = Seq.empty,
    /** the table root as a QUALIFIED URI path (no trailing slash) — what
      * a `PartitionedFile.toPath.toUri.getPath` prefix-matches against to
      * recover the file's relative path on executors. */
    val rootUriPath: String = "") extends ParquetFileFormat {

  require(dvPaths.nonEmpty || mappedSchema.nonEmpty || dirKeys.nonEmpty,
    "GraftParquetFileFormat is only for DV-bearing, column-mapped, or " +
      "partition-converted snapshots — use ParquetFileFormat")
  require(dirKeys.isEmpty || rootUriPath.nonEmpty,
    "dirKeys require rootUriPath to relativize file paths")

  // pushed source filters name nested attributes with dotted paths
  private val filterMap: Map[String, String] =
    mappedSchema.map(ColumnMapping.nameMapFlat).getOrElse(Map.empty)

  // rows must arrive one-by-one so the bitmap filter can drop them (DVs)
  // or the dir-value patch can rewrite them (converted trees);
  // ParquetFileFormat still uses the vectorized reader underneath and
  // hands rows off the ColumnarBatch. Mapping alone keeps columnar
  // batches — only names change, not row flow.
  override def supportBatch(sparkSession: SparkSession,
      schema: StructType): Boolean =
    if (dvPaths.nonEmpty || dirKeys.nonEmpty) false
    else super.supportBatch(sparkSession, schema)

  private def toPhysical(s: StructType): StructType = mappedSchema match {
    case Some(stored) =>
      ColumnMapping.toPhysicalFor(stored, s).asInstanceOf[StructType]
    case None => s
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // column mapping: ask parquet for the PHYSICAL names (and push filters
    // under them); the returned rows are positional, nothing to undo
    val physData = toPhysical(dataSchema)
    val physRequired = toPhysical(requiredSchema)
    val physFilters =
      if (mappedSchema.isEmpty) filters
      else filters.flatMap(ColumnMapping.mapFilter(filterMap, _))
    if (dvPaths.isEmpty && dirKeys.isEmpty)
      return super.buildReaderWithPartitionValues(sparkSession, physData,
        partitionSchema, physRequired, physFilters, options, hadoopConf)
    val needIdx = dvPaths.nonEmpty
    val rowIdxName = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val haveIdx = physRequired.fieldNames.contains(rowIdxName)
    // NULLABLE is load-bearing: the column is absent from every data file,
    // and the vectorized reader THROWS on a missing required column before
    // the row-index generator ever sees it — a missing nullable one is
    // routed through isRowIndexColumn and populated with real row indexes
    val schemaWithIdx =
      if (haveIdx || !needIdx) physRequired
      else StructType(physRequired.fields :+
        StructField(rowIdxName, LongType, nullable = true))
    val base = super.buildReaderWithPartitionValues(sparkSession, physData,
      partitionSchema, schemaWithIdx, physFilters, options, hadoopConf)
    val idxOrdinal = schemaWithIdx.fieldNames.indexOf(rowIdxName)
    // the reader runs on executors: ship the conf once per executor, and
    // capture only immutable locals (never `this`)
    val confBc = sparkSession.sparkContext.broadcast(
      new SerializableHadoopConf(hadoopConf))
    val tableP = tablePath
    val dvs = dvPaths
    // dir-derived partition columns the query actually requested, as
    // (dir depth, output ordinal, field) — projection-pruned queries that
    // never touch a partition column patch nothing
    val patchCols: Seq[(Int, Int, StructField)] =
      dirKeys.zipWithIndex.flatMap { case (f, depth) =>
        val ord = schemaWithIdx.fieldNames.indexOf(f.name)
        if (ord < 0) None else Some((depth, ord, schemaWithIdx.fields(ord)))
      }
    val rootPrefix = rootUriPath.stripSuffix("/") + "/"
    val nDirs = dirKeys.length
    val keyNames = dirKeys.map(_.name).toArray
    val tz = sparkSession.sessionState.conf.sessionLocalTimeZone
    // honor the session's ANSI mode like withDirPartitionColumns' .cast
    // does — the two read surfaces must render a partition value the same
    val castMode =
      if (sparkSession.sessionState.conf.ansiEnabled) EvalMode.ANSI
      else EvalMode.LEGACY
    val stripIdx = needIdx && !haveIdx
    // partition values ride BEHIND requiredSchema in the reader's output;
    // strip only the borrowed row-index column, keeping everything else
    val outFields = (if (stripIdx)
        schemaWithIdx.fields.zipWithIndex.filter(_._1.name != rowIdxName)
      else schemaWithIdx.fields.zipWithIndex).toSeq ++
      partitionSchema.fields.zipWithIndex.map { case (f, i) =>
        (f, schemaWithIdx.length + i)
      }

    (file: PartitionedFile) => {
      val abs = file.toPath.toUri.getPath
      // DV bindings are keyed by the file's LOG name — its table-relative
      // path. For flat tables that is the basename; on a converted tree a
      // nested `k=v/part-X.parquet` must NOT inherit a DV bound to a flat
      // file that happens to share its basename, so relativize when the
      // root is known (rootUriPath is always set when nested files exist).
      val name =
        if (rootPrefix.length > 1 && abs.startsWith(rootPrefix))
          abs.stripPrefix(rootPrefix)
        else file.toPath.getName
      val rows = base(file)
      val filtered =
        if (!needIdx) rows
        else dvs.get(name) match {
          case None => rows
          case Some(dvName) =>
            val positions = DvCache.get(tableP, dvName, confBc.value.conf)
            rows.filter(r =>
              java.util.Arrays.binarySearch(positions, r.getLong(idxOrdinal)) < 0)
        }
      // dir-value patch: a file at exactly the converted tree's depth
      // parses its `k=v` segments once; DML-staged flat files (depth 0)
      // and unrequested columns contribute nothing. `file.toPath` already
      // un-did the URI encoding layer, so ONE hive-unescape remains.
      val patch: Map[Int, Any] =
        if (patchCols.isEmpty) Map.empty
        else {
          if (!abs.startsWith(rootPrefix)) Map.empty
          else {
            val segs = abs.stripPrefix(rootPrefix).split('/')
            if (segs.length != nDirs + 1) Map.empty
            else patchCols.flatMap { case (depth, ord, f) =>
              val seg = segs(depth)
              if (!seg.startsWith(keyNames(depth) + "=")) None
              else {
                // read path: an undecodable value degrades to the raw
                // string (scan still serves), matching withDirPartitionColumns
                val raw = GraftTable.hiveUnescapeOrRaw(
                  seg.substring(keyNames(depth).length + 1))
                // empty value and the hive null sentinel are both NULL —
                // exactly withDirPartitionColumns' rendering, so the same
                // table answers the same query identically on each surface
                val v: Any =
                  if (raw.isEmpty || raw == "__HIVE_DEFAULT_PARTITION__") null
                  else Cast(Literal(UTF8String.fromString(raw), StringType),
                    f.dataType, Option(tz), castMode).eval(null)
                // a null path value coalesces to the page's null anyway
                if (v == null) None else Some(ord -> v)
              }
            }.toMap
          }
        }
      if (patch.isEmpty && !stripIdx) filtered
      else {
        val proj = UnsafeProjection.create(outFields.map { case (f, i) =>
          patch.get(i) match {
            // page value wins where present (mixed layouts: a flat
            // rewrite carries the column as data) — same coalesce
            // semantics as GraftTable.withDirPartitionColumns
            case Some(v) => Coalesce(Seq(
              BoundReference(i, f.dataType, f.nullable), Literal(v, f.dataType)))
            case None => BoundReference(i, f.dataType, f.nullable)
          }
        })
        filtered.map(proj)
      }
    }
  }

  // relation equality feeds plan caching/exchange reuse: two snapshots
  // with different DV bindings or mappings must never dedupe into one scan
  override def equals(other: Any): Boolean = other match {
    case g: GraftParquetFileFormat =>
      g.tablePath == tablePath && g.dvPaths == dvPaths &&
        g.mappedSchema == mappedSchema && g.dirKeys == dirKeys &&
        g.rootUriPath == rootUriPath
    case _ => false
  }
  override def hashCode(): Int =
    (tablePath, dvPaths, mappedSchema, dirKeys, rootUriPath).hashCode()

  override def toString: String =
    s"GraftParquet(${dvPaths.size} DVs, ${filterMap.size} renames, " +
      s"${dirKeys.size} dir keys)"
}
