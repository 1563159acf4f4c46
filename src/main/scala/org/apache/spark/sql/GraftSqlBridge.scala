package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private accessors Spark 4 hides behind `private[sql]`,
  * needed to wrap a custom catalyst Expression as a user-facing Column
  * (the documented pattern for native-expression extension libraries).
  * Kept to the two conversions — nothing else of the internal API is
  * exposed. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
