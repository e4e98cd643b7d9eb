package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression converters (Spark 4 moved
  * the classic Column internals behind `org.apache.spark.sql.classic`)
  * and to the session FunctionRegistry. Lives under the
  * org.apache.spark.sql package so the access qualifier admits it — the
  * one place this library reaches into Spark internals.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an ALREADY-RUNNING session (the
    * extensions path only applies at session construction). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name),
        builder)
}

/** Base for unary expressions whose child must be LongType: mixes in
  * `ImplicitCastInputTypes` (whose `AbstractDataType` vocabulary is
  * `private[sql]`, hence this lives in the shim package) so the
  * analyzer inserts an implicit cast for narrower children — keeping
  * the interpreted `asInstanceOf[Long]` path and the codegen path in
  * agreement on e.g. integer literals. */
abstract class LongInputUnaryExpression
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
}
