package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made direct `Column(expression)` construction `private[sql]`
  * (the public `Column` wraps a connect-compatible `ColumnNode`). Classic
  * (non-connect) libraries that ship their own expressions conventionally
  * bridge through a shim in the `org.apache.spark.sql` namespace; this is
  * that shim. Only used to wrap graft's own expressions — everything else
  * goes through the public `functions._` API.
  */
object ColumnBridge {

  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst Expression (classic plans only). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
