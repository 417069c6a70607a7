package graft.tables

import org.apache.spark.sql.types.{DataType, StructType}

/** A table in this log requires a reader capability this binary does not
  * have. Deliberately its own type: the checkpoint-selection fallback in
  * [[GraftTable.snapshot]] swallows UNREADABLE checkpoints (corruption —
  * an optimization, never a correctness input) but must NOT swallow this —
  * an unsupported table is a refusal, not a degrade. */
final class UnsupportedTableFeatureException(msg: String)
  extends IllegalStateException(msg)

/** Delta-style reader-feature gating for the commit log (Delta's
  * minReaderVersion/readerFeatures, reduced to the named-feature set —
  * the part that matters: a reader that does not KNOW a feature must
  * refuse the table, loudly).
  *
  * Why this exists: the log is a durable FORMAT. A v16-era table with
  * deletion vectors opened by a reader that ignores the `dvs` field would
  * silently resurrect deleted rows; one with column mapping would leak
  * physical column names; a partition-converted tree would lose its
  * partition values. Each commit therefore records the reader features its
  * CONTENT depends on, checkpoints carry the running union (so a
  * vacuumLog-trimmed history still gates), and every read surface — batch,
  * SQL, streaming, CDF, time travel — funnels through [[GraftTable]]'s
  * commit/checkpoint parses, which call [[requireReadable]] before serving
  * a single row. An absent `features` field decodes as the empty set, so
  * every pre-gate table reads unchanged.
  *
  * Features are derived from commit CONTENT ([[featuresOf]]) rather than
  * declared by call sites: a new write path cannot forget to stamp the
  * gate, and a hand-laid log gates by what it actually contains.
  */
object GraftProtocol {

  /** Commit carries live deletion-vector bindings ([[DeletionVectors]]):
    * a reader that ignores them resurrects deleted rows. */
  final val Dv = "dv"
  /** Commit schema carries column-mapping metadata ([[ColumnMapping]]):
    * a reader that ignores it serves physical names and dropped columns. */
  final val ColumnMappingFeature = "column_mapping"
  /** Commit adopts nested `k=v/...` file names ([[GraftTable.convert]]):
    * a reader that ignores the layout loses the partition columns the
    * paths carry. */
  final val PartitionConvert = "partition_convert"

  /** Reader features THIS binary implements. A foreign/legacy reader of
    * this log format must refuse any feature outside its own set. */
  val ReaderFeatures: Set[String] = Set(Dv, ColumnMappingFeature, PartitionConvert)

  /** Refuse (loudly, with the feature NAMED) any required feature this
    * reader does not implement. `where` names the artifact that recorded
    * the requirement — commit vN or a checkpoint — so the error points at
    * evidence, not a guess. */
  def requireReadable(required: Iterable[String], table: String, where: String): Unit = {
    val unknown = required.toSet -- ReaderFeatures
    if (unknown.nonEmpty)
      throw new UnsupportedTableFeatureException(
        s"table $table requires reader feature(s) " +
          s"[${unknown.toSeq.sorted.mkString(", ")}] (recorded in $where) " +
          s"that this reader does not support (supported: " +
          s"[${ReaderFeatures.toSeq.sorted.mkString(", ")}]) — upgrade the " +
          "graft library to read this table")
  }

  /** The reader features `c`'s content depends on, sorted (deterministic
    * log bytes). None when baseline — the common commit pays zero extra
    * log bytes and pre-gate logs stay byte-compatible. */
  def featuresOf(c: Commit): Option[Seq[String]] = {
    val b = Seq.newBuilder[String]
    // column_mapping sorts before dv/partition_convert: keep alphabetical
    if (schemaRequiresMapping(c.schemaJson)) b += ColumnMappingFeature
    if (c.dvs.exists(_.values.exists(_ != DeletionVectors.Cleared))) b += Dv
    if (c.add.exists(_.contains("/"))) b += PartitionConvert
    val fs = b.result()
    if (fs.isEmpty) None else Some(fs)
  }

  // single-entry memo: a streaming ingest stamps dozens of commits per
  // batch with the IDENTICAL schema JSON — one string compare beats a
  // JSON parse per commit, and one entry is enough because consecutive
  // commits share their schema
  @volatile private var lastSchemaProbe: (String, Boolean) = ("", false)

  /** Does this schema JSON carry column-mapping state? Shared by the
    * per-commit stamp and the snapshot's content-derived union (the
    * pre-gate-history self-heal in [[GraftTable.snapshot]]). */
  private[tables] def schemaRequiresMapping(schemaJson: String): Boolean = {
    if (schemaJson == null || schemaJson.isEmpty) return false
    val cached = lastSchemaProbe
    if (cached._1 == schemaJson) return cached._2
    val r =
      try ColumnMapping.active(DataType.fromJson(schemaJson).asInstanceOf[StructType])
      catch { case scala.util.control.NonFatal(_) => false }
    lastSchemaProbe = (schemaJson, r)
    r
  }
}
