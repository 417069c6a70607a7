package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Second narrow bridge (after [[ColumnBridge]]): `internalCreateDataFrame`
  * is `private[sql]`, but it is the only way a DSv1 streaming `Source` can
  * hand back a batch that passes `MicroBatchExecution`'s
  * `assert(batch.isStreaming)` (FileStreamSource does exactly this), and
  * the only way a `Sink` can re-plan the micro-batch it receives for a
  * plain write (the incoming frame is pinned to the stream's
  * IncrementalExecution). */
object StreamBridge {

  private def classic(df: DataFrame) =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Re-wrap a batch plan as a STREAMING frame for `Source.getBatch`. */
  def asStreamingFrame(df: DataFrame): DataFrame =
    classic(df).internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** Re-wrap a micro-batch a `Sink.addBatch` received as a standalone
    * batch frame that a normal writer can consume. */
  def asBatchFrame(df: DataFrame): DataFrame =
    classic(df).internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
}
