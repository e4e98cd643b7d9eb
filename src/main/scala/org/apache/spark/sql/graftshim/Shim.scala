package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters (Spark 4 moved
  * the classic Column internals behind `org.apache.spark.sql.classic`).
  * Lives under the org.apache.spark.sql package so the access qualifier
  * admits it — the one place this library reaches into Spark internals.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
