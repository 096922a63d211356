package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` wrap a `ColumnNode` instead of a Catalyst
  * `Expression`; the two-way bridge lives in `private[sql]`
  * `classic.ExpressionUtils`. This shim re-exports it for graft's custom
  * expressions — the conventional extension-library pattern (connectors
  * do the same to reach classic internals).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
