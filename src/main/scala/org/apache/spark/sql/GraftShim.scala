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

  /** A DataFrame over a hand-built logical plan (Dataset.ofRows went
    * private[sql] too) — used to run a stored view SQL with some of
    * its relations substituted by other plans (incremental MV refresh
    * scoping catalog-dotted sources to their append deltas). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
