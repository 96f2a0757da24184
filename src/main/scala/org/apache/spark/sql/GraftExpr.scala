package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions into public Columns
  * (the constructor is `private[sql]` in Spark 4's classic API).
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Full ColumnNode → Catalyst conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that Dataset analysis unwraps but a
    * `FunctionRegistry` builder's output does not — codegen then dies on
    * the wrapper. Function builders (GraftFunctions) therefore convert
    * eagerly; the result may still contain `UnresolvedFunction` nodes,
    * which the analyzer resolves as usual.
    */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
