package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression <-> Column converters that
  * Spark 4 hid behind the ColumnNode API. Lives in the
  * `org.apache.spark.sql` package purely for access; the standard
  * pattern for third-party Catalyst extensions.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
