package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one place graft reaches a `private[sql]` Spark API: converting
  * between `Column` and Catalyst `Expression` (Spark 4.x routes Column
  * through ColumnNode, and the public surface offers no constructor).
  * Lives in an `org.apache.spark.sql` subpackage solely for visibility —
  * the standard technique for Spark-native extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
