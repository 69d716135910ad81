package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the private[sql] Column↔Expression converters —
  * the supported extension point for libraries shipping native Catalyst
  * expressions (the public API exposes no constructor for a Column over
  * a custom Expression in Spark 4).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
