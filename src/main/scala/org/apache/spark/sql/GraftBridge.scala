package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. The converters live behind
  * `private[sql]` in Spark 4 (`classic.ExpressionUtils`), so extension
  * libraries shipping native expressions expose them from inside the
  * package — the standard pattern for Catalyst extensions.
  */
object GraftBridge {
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
