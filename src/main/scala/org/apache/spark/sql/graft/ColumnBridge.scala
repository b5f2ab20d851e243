package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression glue so
  * graft's native Catalyst expressions can be exposed through the public
  * Column API. Living under org.apache.spark.sql is the established
  * pattern for Spark-extension libraries that ship custom expressions;
  * nothing here adds behavior — it only re-exports two converters and
  * the session function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully-converted catalyst expression for a Column built from the
    * public `functions._` DSL. `expression` wraps the Column's node in a
    * lazily-converted `ColumnNodeExpression`, which the Dataset API
    * resolves during plan construction — but an expression returned from
    * a FunctionBuilder goes straight into an already-built SQL plan,
    * where nothing converts the node and codegen hits an Unevaluable.
    * This converts eagerly instead (UnresolvedFunction nodes inside come
    * out as catalyst UnresolvedFunction, which the analyzer resolves as
    * it would any SQL function call). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: FunctionIdentifier, info: ExpressionInfo, builder: FunctionBuilder): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
