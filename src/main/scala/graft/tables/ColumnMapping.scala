package graft.tables

import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, MetadataBuilder, StructField, StructType}

/** Column mapping — RENAME/DROP COLUMN as METADATA-ONLY commits (Delta's
  * name-mode column mapping): every data file keeps the PHYSICAL column
  * names it was written with, forever; the log schema carries each
  * field's logical name plus (when they diverge) its physical name in
  * field metadata. A rename changes the logical name and keeps the
  * physical — zero files touched, which at 100 TB is the difference
  * between an instant DDL and rewriting the corpus. A drop turns the
  * field into a TOMBSTONE (mangled logical name + `graft.dropped`) so
  * its physical name stays claimed — a later column REUSING the dropped
  * name gets a fresh physical name and can never resurrect the old
  * bytes. The mapping lives INSIDE each commit's schema JSON, so time
  * travel, CDF synthesis, and the streaming source all see the mapping
  * that was true at their version. NESTED struct leaves map too
  * (`rename/drop "s.a"` — Delta's nested column mapping): the metadata
  * rides on the nested [[StructField]]s, every transform here recurses
  * through struct/array/map types, and physical-name uniqueness is
  * scoped per enclosing struct (parquet resolves names per level).
  *
  * Scan-side: [[InternalRow]]s are positional — names only matter when
  * asking parquet for columns. [[GraftParquetFileFormat]] rewrites the
  * requested schema's names logical→physical AT EVERY LEVEL before
  * handing it to the parquet reader and translates pushed filters the
  * same way (dotted paths); the rows that come back need no further
  * mapping. */
private[tables] object ColumnMapping {

  val PhysicalKey = "graft.physical"
  val DroppedKey = "graft.dropped"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  private def mapNested(dt: DataType)(f: StructType => StructType): DataType =
    dt match {
      case s: StructType => f(s)
      case a: ArrayType  => a.copy(elementType = mapNested(a.elementType)(f))
      case m: MapType    => m.copy(valueType = mapNested(m.valueType)(f))
      case other         => other
    }

  /** The user-visible schema: tombstones removed, at every depth. */
  def logicalSchema(stored: StructType): StructType =
    StructType(stored.fields.filterNot(isDropped).map(fl =>
      fl.copy(dataType = mapNested(fl.dataType)(logicalSchema))))

  /** The file-side schema of the live columns: physical names, at every
    * depth. */
  def physicalSchema(stored: StructType): StructType =
    StructType(stored.fields.filterNot(isDropped).map(fl =>
      fl.copy(name = physicalName(fl),
        dataType = mapNested(fl.dataType)(physicalSchema))))

  /** TOP-LEVEL logical -> physical, only where they differ (the frame-
    * rename map; nested mapping rides through [[toPhysicalFor]]'s typed
    * casts instead of name pairs). */
  def nameMap(stored: StructType): Map[String, String] =
    stored.fields.filterNot(isDropped).flatMap { f =>
      val p = physicalName(f)
      if (p == f.name) None else Some(f.name -> p)
    }.toMap

  /** DOTTED logical path -> dotted physical path for every divergent
    * leaf at any depth — the domain pushed source filters name nested
    * attributes in. */
  def nameMapFlat(stored: StructType): Map[String, String] = {
    def walk(prefL: String, prefP: String, s: StructType): Seq[(String, String)] =
      s.fields.filterNot(isDropped).flatMap { f =>
        val lp = if (prefL.isEmpty) f.name else s"$prefL.${f.name}"
        val pn = physicalName(f)
        val pp = if (prefP.isEmpty) pn else s"$prefP.$pn"
        val self = if (lp == pp) Seq.empty else Seq(lp -> pp)
        val kids = f.dataType match {
          case st: StructType => walk(lp, pp, st)
          case _ => Seq.empty
        }
        self ++ kids
      }
    walk("", "", stored).toMap
  }

  /** Is any mapping state present (divergent physical or tombstone) at
    * any depth — through arbitrarily nested array/map wrappers, matching
    * exactly what [[GraftTable.transformStructAt]] can create? Gates the
    * mapped read/write paths — false keeps every table that never ran a
    * rename/drop on its pre-mapping fast path. */
  def active(stored: StructType): Boolean =
    stored.fields.exists(f =>
      isDropped(f) || physicalName(f) != f.name || activeIn(f.dataType))

  private def activeIn(dt: DataType): Boolean = dt match {
    case s: StructType => active(s)
    case a: ArrayType  => activeIn(a.elementType)
    case m: MapType    => activeIn(m.valueType)
    case _             => false
  }

  /** Physical names already claimed by any field IN THIS STRUCT,
    * tombstones included — a NEW column must never adopt one of these as
    * its physical name. (Uniqueness is per struct level: parquet
    * resolves names within their group.) */
  def claimedPhysicals(stored: StructType): Set[String] =
    stored.fields.map(physicalName).toSet

  /** Rewrite a REQUESTED type (logical names, possibly a pruned subset)
    * to physical names by matching fields against the stored schema BY
    * NAME at every level — field order and subset structure of the
    * request are preserved, so positional row semantics are untouched. */
  def toPhysicalFor(storedDt: DataType, requested: DataType): DataType =
    (storedDt, requested) match {
      case (s: StructType, r: StructType) =>
        StructType(r.fields.map { rf =>
          s.fields.find(sf => !isDropped(sf) && sf.name == rf.name) match {
            case Some(sf) => rf.copy(name = physicalName(sf),
              dataType = toPhysicalFor(sf.dataType, rf.dataType))
            case None => rf // engine-added columns (row-index temp, bucket)
          }
        })
      case (s: ArrayType, r: ArrayType) =>
        r.copy(elementType = toPhysicalFor(s.elementType, r.elementType))
      case (s: MapType, r: MapType) =>
        r.copy(valueType = toPhysicalFor(s.valueType, r.valueType))
      case _ => requested
    }

  /** Recursively nullable form of a type — the rename-only positional
    * cast in the mapped read path must never TIGHTEN nullability (a cast
    * to a NOT NULL struct field is refused by the analyzer). */
  def relaxNullability(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(nullable = true, dataType = relaxNullability(f.dataType))))
    case a: ArrayType =>
      ArrayType(relaxNullability(a.elementType), containsNull = true)
    case m: MapType => MapType(relaxNullability(m.keyType),
      relaxNullability(m.valueType), valueContainsNull = true)
    case other => other
  }

  def withPhysical(f: StructField, physical: String): StructField = {
    val mb = new MetadataBuilder().withMetadata(f.metadata)
    if (physical == f.name) mb.remove(PhysicalKey) else mb.putString(PhysicalKey, physical)
    f.copy(metadata = mb.build())
  }

  def tombstone(f: StructField): StructField = {
    val mangled = s"__dropped_${f.name}_${java.util.UUID.randomUUID().toString.take(8)}"
    val meta = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalKey, physicalName(f))
      .putBoolean(DroppedKey, true)
      .build()
    StructField(mangled, f.dataType, nullable = true, meta)
  }

  /** Fresh physical name for a column whose logical name is already
    * claimed as some field's physical (re-use after drop/rename). */
  def freshPhysical(): String =
    s"col_${java.util.UUID.randomUUID().toString.take(8)}"

  /** The physical→logical projection over a scan read under `phys`: one
    * column per field, cast to the logical type (the positional struct
    * cast renames NESTED leaves too) and aliased with the LOGICAL field's
    * name AND metadata — a bare `.as(name)` would propagate the scanned
    * attribute's mapping keys into the output schema, the exact leak
    * [[cleanMetadata]] exists to prevent. `phys` and `logical` must be
    * the same recursion over the same stored schema (field-for-field).
    * THE single implementation behind [[GraftTable.readDataFiles]] and
    * the streaming source's batch read — a fix here lands in both. */
  def logicalProjection(phys: StructType,
      logical: StructType): Seq[org.apache.spark.sql.Column] =
    phys.fields.zip(logical.fields).map { case (pf, lf) =>
      val c = org.apache.spark.sql.functions.col(pf.name)
      // relaxed: the rename-only cast must never TIGHTEN nullability
      // (cast to a NOT NULL struct field is refused)
      val target = relaxNullability(lf.dataType)
      (if (relaxNullability(pf.dataType) == target) c
       else c.cast(target)).as(lf.name, lf.metadata)
    }.toIndexedSeq

  /** Strip mapping metadata from a schema users receive (the physical
    * name is an implementation detail; leaking it would also survive
    * into frames users write back), at every depth. */
  def cleanMetadata(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
        .remove(PhysicalKey).remove(DroppedKey)
      f.copy(metadata = mb.build(),
        dataType = mapNested(f.dataType)(cleanMetadata))
    })

  /** Rewrite a pushed source filter's attribute names logical→physical.
    * Unknown filter shapes are DROPPED, not passed through: a filter is
    * a pushdown HINT — Spark re-applies the full predicate above the
    * scan — so dropping costs I/O, while a wrong name returns wrong
    * rows from the footer index.
    *
    * POLARITY: a hint must only ever WEAKEN the real predicate. Dropping
    * one side of an AND weakens it — but only in POSITIVE positions. The
    * same move beneath a NOT strengthens the overall predicate
    * (`Not(And(a, unknown))` → `Not(a)` admits fewer rows than the
    * truth), and row-group stats would then skip groups holding matching
    * rows. `positive` flips at every NOT; a partially-translatable AND
    * in a negative position drops the whole subtree instead. */
  def mapFilter(m: Map[String, String], f: Filter,
      positive: Boolean = true): Option[Filter] = {
    def col(a: String): String = m.getOrElse(a, a)
    f match {
      case sources.EqualTo(a, v)            => Some(sources.EqualTo(col(a), v))
      case sources.EqualNullSafe(a, v)      => Some(sources.EqualNullSafe(col(a), v))
      case sources.GreaterThan(a, v)        => Some(sources.GreaterThan(col(a), v))
      case sources.GreaterThanOrEqual(a, v) => Some(sources.GreaterThanOrEqual(col(a), v))
      case sources.LessThan(a, v)           => Some(sources.LessThan(col(a), v))
      case sources.LessThanOrEqual(a, v)    => Some(sources.LessThanOrEqual(col(a), v))
      case sources.In(a, vs)                => Some(sources.In(col(a), vs))
      case sources.IsNull(a)                => Some(sources.IsNull(col(a)))
      case sources.IsNotNull(a)             => Some(sources.IsNotNull(col(a)))
      case sources.StringStartsWith(a, v)   => Some(sources.StringStartsWith(col(a), v))
      case sources.StringEndsWith(a, v)     => Some(sources.StringEndsWith(col(a), v))
      case sources.StringContains(a, v)     => Some(sources.StringContains(col(a), v))
      case sources.And(l, r) =>
        (mapFilter(m, l, positive), mapFilter(m, r, positive)) match {
          case (Some(a), Some(b)) => Some(sources.And(a, b))
          // AND may weaken to one side only where weakening is sound
          case (a, b) if positive => a.orElse(b)
          case _                  => None
        }
      case sources.Or(l, r) =>
        (mapFilter(m, l, positive), mapFilter(m, r, positive)) match {
          case (Some(a), Some(b)) => Some(sources.Or(a, b))
          // beneath a NOT an OR side-drop WEAKENS the overall hint
          // (Not(Or(a,u)) = Not(a) AND Not(u), and Not(a) alone admits
          // more rows) — the mirror image of the AND rule above
          case (a, b) if !positive => a.orElse(b)
          case _                   => None
        }
      case sources.Not(c) => mapFilter(m, c, !positive).map(sources.Not)
      case _ => None
    }
  }

  /** Rename a frame's columns through `m` (logical→physical or the
    * inverse). Only top-level names. */
  def renameColumns(df: org.apache.spark.sql.DataFrame,
      m: Map[String, String]): org.apache.spark.sql.DataFrame =
    m.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
}
