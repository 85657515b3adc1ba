package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's custom
  * Catalyst expressions can be exposed as Columns. Standard extension
  * technique for libraries shipping native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
