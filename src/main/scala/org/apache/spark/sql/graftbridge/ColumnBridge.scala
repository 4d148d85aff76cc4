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

  /** Build a DataFrame from a logical plan (Dataset.ofRows is
    * `private[sql]` in Spark 4) — used to apply a graft optimizer rule
    * explicitly to one query without touching session-wide config.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
