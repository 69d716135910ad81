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

  /** Convert a composed Column into a real (possibly unresolved)
    * catalyst Expression tree. Unlike [[expression]] — which wraps the
    * column node in a lazy `ColumnNodeExpression` that only plan
    * builders unwrap — this eagerly runs the node converter, so the
    * result is usable where a genuine Expression is required (e.g.
    * returned from a FunctionRegistry builder, where the analyzer
    * resolves the inner functions but would not unwrap the lazy node).
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
