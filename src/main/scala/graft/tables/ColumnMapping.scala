package graft.tables

import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

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
  * that was true at their version. Top-level columns only (nested
  * renames rewrite, like pre-mapping Delta).
  *
  * Scan-side: [[InternalRow]]s are positional — names only matter when
  * asking parquet for columns. [[GraftParquetFileFormat]] rewrites the
  * requested schema's names logical→physical before handing it to the
  * parquet reader and translates pushed filters the same way; the rows
  * that come back need no further mapping. */
private[tables] object ColumnMapping {

  val PhysicalKey = "graft.physical"
  val DroppedKey = "graft.dropped"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** The user-visible schema: tombstones removed. */
  def logicalSchema(stored: StructType): StructType =
    StructType(stored.fields.filterNot(isDropped))

  /** The file-side schema of the live columns: physical names. */
  def physicalSchema(stored: StructType): StructType =
    StructType(stored.fields.filterNot(isDropped)
      .map(f => f.copy(name = physicalName(f))))

  /** logical -> physical, only where they differ. Empty = mapping is a
    * no-op and every path stays on its pre-mapping fast path. */
  def nameMap(stored: StructType): Map[String, String] =
    stored.fields.filterNot(isDropped).flatMap { f =>
      val p = physicalName(f)
      if (p == f.name) None else Some(f.name -> p)
    }.toMap

  /** Is any mapping state present (divergent physical or tombstone)? */
  def active(stored: StructType): Boolean =
    stored.fields.exists(f => isDropped(f) || physicalName(f) != f.name)

  /** Physical names already claimed by any field, tombstones included —
    * a NEW column must never adopt one of these as its physical name. */
  def claimedPhysicals(stored: StructType): Set[String] =
    stored.fields.map(physicalName).toSet

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

  /** Strip mapping metadata from a schema users receive (the physical
    * name is an implementation detail; leaking it would also survive
    * into frames users write back). */
  def cleanMetadata(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
        .remove(PhysicalKey).remove(DroppedKey)
      f.copy(metadata = mb.build())
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
