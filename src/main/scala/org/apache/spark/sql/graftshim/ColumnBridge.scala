package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Catalyst-Expression converters in
  * Spark 4.x (Column wraps a ColumnNode since the Connect unification; the
  * classic converters live behind package-private access). Lives under
  * org.apache.spark.sql to satisfy the access qualifier — the standard
  * extension-library shim, no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
