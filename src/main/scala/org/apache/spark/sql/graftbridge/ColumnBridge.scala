package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column<->Expression conversion behind
  * `private[sql] classic.ExpressionUtils`; this bridge (compiled into
  * the sql package namespace, the standard extension-library pattern)
  * re-exports the two converters graft's native expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same bridge pattern for constructing a DataFrame from a custom
  * [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
  * (`classic.Dataset.ofRows` is private[sql]).
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
