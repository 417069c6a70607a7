package graft.lake

import graft.conf.GraftSettings

/** A lake table address: the 4-tuple `(layer, project, database, table)`
  * (reference `jibaro/datalake/path.py:7-25`). A "table" is a directory of
  * files addressed by this tuple, not a catalog object.
  */
final case class TableRef(layer: String, project: String, database: String, table: String) {
  require(layer != null && layer.nonEmpty, "layer required")
  require(project != null && project.nonEmpty, "project required")
  require(database != null && database.nonEmpty, "database required")
  require(table != null && table.nonEmpty, "table required")

  def relativePath: String = s"$project/$database/$table"
}

/** 4-tuple -> URI mounting for the three sibling trees: data, streaming
  * checkpoints, and table history (reference `path.py:7-61` —
  * `mount_path` / `mount_checkpoint_path` / `mount_history_path`).
  */
object LakePath {

  /** Data tree: `{protocol}://{bucket(layer)}/{project}/{database}/{table}`. */
  def data(ref: TableRef)(implicit s: GraftSettings): String =
    s"${s.protocol}://${s.bucketFor(ref.layer)}/${ref.relativePath}"

  /** Streaming-checkpoint tree under the control bucket, keyed by layer then
    * tuple (reference `path.py:28-47`). */
  def checkpoint(ref: TableRef)(implicit s: GraftSettings): String =
    s"${s.protocol}://${s.controlBucket}/_checkpoint/${ref.layer}/${ref.relativePath}"

  /** Table-history tree under the control bucket (reference `path.py:50-61`). */
  def history(ref: TableRef)(implicit s: GraftSettings): String =
    s"${s.protocol}://${s.controlBucket}/_history/${ref.layer}/${ref.relativePath}"
}
