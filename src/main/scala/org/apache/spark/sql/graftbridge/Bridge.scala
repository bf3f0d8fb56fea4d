package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crack in the `private[sql]` wall: building a DataFrame
  * from a custom LogicalPlan requires `Dataset.ofRows`, which Spark exposes
  * only inside its own package — every extension library that adds logical
  * operators ships a bridge like this.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Spark 4 Columns wrap ColumnNodes; the EAGER converter recovers a real
    * Catalyst tree (SortOrder included). `ExpressionUtils.expression` only
    * wraps lazily in a non-serializable ColumnNodeExpression.
    */
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The reverse direction: wrap a Catalyst Expression as a Column. */
  def col(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
