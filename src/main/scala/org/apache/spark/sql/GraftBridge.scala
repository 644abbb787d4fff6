package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression converters, the
 * standard pattern for extension libraries that contribute native Catalyst
 * expressions (Spark 4 split Column off to a ColumnNode API; classic conversions live
 * behind `private[sql]`). Kept to exactly two forwarders — everything else in graft
 * uses only the public API.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
