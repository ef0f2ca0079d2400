package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's classic Column <-> Catalyst Expression conversion
  * (`ExpressionUtils` is private[sql]). This is the standard extension-library
  * pattern for exposing custom Catalyst expressions as user-facing Columns.
  */
package object graftshim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression as a temp SQL function on a live session
    * (FunctionRegistry is private[sql] — same bridge pattern as above). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
