/* Package-private bridge, same pattern as public extension libraries
 * (e.g. Qbeast's DatasetFactory): expose Dataset.ofRows so library
 * code outside org.apache.spark.sql can build a DataFrame from a
 * custom LogicalPlan.
 */
package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

object GraftPlanFactory {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[Row]].queryExecution.analyzed

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)

  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}
