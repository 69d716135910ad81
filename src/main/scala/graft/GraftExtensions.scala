package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{DoubleMetaphoneExpression, MetaphoneExpression}

/** Session-extension entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Registers graft's native expressions as SQL functions
  * (`graft_metaphone`, `graft_double_metaphone`). Custom
  * LogicalPlans/Strategies are deliberately NOT injected: every graft
  * operator is expressible as a declarative DataFrame plan, which keeps
  * Catalyst free to optimize — see SURVEY.md §4.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      MetaphoneExpression.identifier,
      MetaphoneExpression.info,
      MetaphoneExpression.builder))
    ext.injectFunction((
      DoubleMetaphoneExpression.identifier,
      DoubleMetaphoneExpression.info,
      DoubleMetaphoneExpression.builder))
  }
}
