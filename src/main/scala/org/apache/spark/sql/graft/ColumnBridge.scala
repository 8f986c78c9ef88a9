package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * (Spark 4 wraps Columns around ColumnNodes, not Expressions). Lives in the
  * org.apache.spark.sql namespace purely for access; the standard pattern for
  * Catalyst-extending libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Expression conversion: [[expression]] wraps the
    * node lazily (ColumnNodeExpression), which FunctionRegistry builders
    * must not return — the analyzer leaves the wrapper unresolved inside
    * an injected function and execution dies at codegen. This converts
    * the whole tree to plain catalyst nodes up front. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
