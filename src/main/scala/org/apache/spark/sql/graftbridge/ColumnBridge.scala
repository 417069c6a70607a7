package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into `private[sql]` surface: wrap a raw Catalyst
  * `Expression` as a public `Column` (Spark 4 moved the Expression-backed
  * Column constructor behind the `classic` converters). This is the single
  * place the engine touches non-public Spark API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
