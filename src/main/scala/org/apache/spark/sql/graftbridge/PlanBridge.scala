package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Third narrow bridge (after [[ColumnBridge]] / [[StreamBridge]]):
  * `Dataset.ofRows` is `private[sql]`, but it is the only way a DML
  * command can evaluate the ANALYZED child plans it captured (target /
  * source of a MERGE) as DataFrames while PRESERVING their attribute ids —
  * which is what lets the user's merge condition and action expressions
  * bind directly as Columns over a join of those frames. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
