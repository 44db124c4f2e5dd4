package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Implicit-cast input declaration for expressions living outside the
  * sql package (`AbstractDataType` in the `inputTypes` signature is
  * `private[sql]`; concrete `DataType`s are public).
  */
trait GraftImplicitCastInputs
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    graftInputTypes
}

/** Bridge to the `private[sql]` Column <-> Expression converters; the
  * supported way for libraries registering custom Catalyst expressions
  * to expose them as user-facing Columns in Spark 4.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register function builders into an ALREADY-running session (the
    * `spark.sql.extensions` route only applies at session build time).
    */
  def registerFunctions(
      spark: SparkSession,
      fns: Seq[(FunctionIdentifier, ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    fns.foreach { case (id, inf, b) =>
      ss.sessionState.functionRegistry.registerFunction(id, inf, b)
    }
  }
}
