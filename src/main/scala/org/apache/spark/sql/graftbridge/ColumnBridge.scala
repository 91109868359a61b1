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
