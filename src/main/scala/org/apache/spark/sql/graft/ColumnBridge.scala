package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column internals — the supported
  * technique for libraries shipping custom Catalyst `Expression`s
  * (Spark 4 moved Column construction behind ColumnNode; this is the
  * one-file shim every expression library needs).
  */
object ColumnBridge {
  /** Wrap a raw Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a user-facing DataFrame — the
    * construction path for custom LogicalPlan operators (Dataset.ofRows
    * is private[sql]). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register an expression builder as a temp function on a live session
    * (the session-build-time path is GraftExtensions via
    * spark.sql.extensions). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        builder)

  /** Register a TABLE function (FROM-clause callable) on a live session
    * — same dual-path pattern as registerFunction. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        builder)
}
