package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4.x moved
  * Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * internal shim). Lives in the `org.apache.spark.sql` package purely for
  * access; contains no logic.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
