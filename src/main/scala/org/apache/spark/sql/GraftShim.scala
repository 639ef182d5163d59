package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions into user-facing
  * Columns. Spark 4 made the Expression<->Column converters
  * private[sql]; extension libraries conventionally expose them from a
  * file compiled into the org.apache.spark.sql package.
  */
object GraftShim {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
