package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils is `private[sql]`), used
  * to wire custom codegen expressions (graft.functions.expressions) into
  * the public Column API without a per-session function registry. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
