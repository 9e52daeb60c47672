package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into the `private[sql]` Column↔Expression conversions — the
 * standard extension-point shim for libraries registering native Catalyst
 * expressions on Spark 4 (the classic `Column.expr`/`new Column(expr)`
 * surface was sealed behind the column-node API).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
