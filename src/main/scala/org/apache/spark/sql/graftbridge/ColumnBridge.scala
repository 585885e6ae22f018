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
    * session's FunctionRegistry and register in place. Idempotent
    * (createOrReplace semantics).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}
