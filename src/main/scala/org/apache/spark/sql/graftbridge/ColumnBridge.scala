package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression bridging `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). Custom Catalyst
  * expressions still need it, so this shim lives under the sql package —
  * the standard pattern for Spark-native extension libraries.
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
