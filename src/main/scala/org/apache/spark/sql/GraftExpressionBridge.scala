package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` Column <-> Expression converters —
  * the standard shim pattern for Spark extension libraries that define
  * custom Catalyst Expressions against the Spark 4 (Connect-era)
  * Column API.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Read back the planner strategies an extensions object injects
    * (the builder accessors are private[sql]; used by tests).
    */
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Wrap a hand-built LogicalPlan as a DataFrame (classic session). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
