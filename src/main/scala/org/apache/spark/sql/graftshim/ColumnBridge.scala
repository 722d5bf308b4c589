package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column<->Expression converters — the
  * standard shim pattern for libraries that register custom Catalyst
  * expressions (Spark 4 moved Column to sql-api and hid the constructors).
  * Keep this the ONLY file inside the org.apache.spark namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
