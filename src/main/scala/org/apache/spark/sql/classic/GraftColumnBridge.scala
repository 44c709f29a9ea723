package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported conversion (`ExpressionUtils.column`) is `private[sql]`. This
  * one-line bridge re-exports it for graft's native expressions — the same
  * approach third-party Spark extensions use to surface custom Catalyst
  * expressions as `Column`s. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** Reverse direction: unwrap a Column back to its Catalyst Expression (for
  * building native expressions over user-supplied columns). */
object ExpressionColumnHelper {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
