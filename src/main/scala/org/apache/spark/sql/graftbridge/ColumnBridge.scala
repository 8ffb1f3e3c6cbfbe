package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for expressions that cannot go
  * through the function registry because they carry runtime state a
  * registry builder cannot receive (e.g. a Broadcast handle —
  * [[graft.functions.CellDistsBcast]]). Lives under org.apache.spark.sql
  * to reach the private[sql] converter; the standard extension-library
  * pattern for plugging custom expressions into the classic DataFrame
  * API (the sanctioned SparkSessionExtensions route only covers
  * registry-constructible expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
