package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x classic
  * backend). Lives under the org.apache.spark.sql package solely to satisfy
  * the access modifier; this is the supported pattern for libraries that
  * ship custom Catalyst expressions without a SQL-extension round-trip.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
