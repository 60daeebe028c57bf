package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the Column <-> Expression bridge behind `private[sql]`
  * (Spark Connect split). Extensions that define custom Catalyst expressions
  * need this tiny in-package shim to expose Columns over them — same pattern
  * as other Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
