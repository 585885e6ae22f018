package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * Spark 4's sanctioned path between the unified Column API and
  * classic catalyst). This is the standard third-party-library escape
  * hatch for registering custom native expressions without a
  * SparkSessionExtensions round-trip; nothing else from the private
  * surface is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime SQL-function registration for sessions built WITHOUT
    * `withExtensions` (the driver's Verify/Bench sessions): reach the
    * session's FunctionRegistry and register in place, with the full
    * ExpressionInfo (so DESCRIBE FUNCTION reports the native class).
    * Idempotent (registerFunction replaces). Non-classic sessions
    * (e.g. Spark Connect) have no in-process registry — a no-op there
    * rather than a ClassCastException that would break every query in
    * the run.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark match {
      case classic: org.apache.spark.sql.classic.SparkSession =>
        classic.sessionState.functionRegistry.registerFunction(
          new org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
      case _ => ()
    }
}
