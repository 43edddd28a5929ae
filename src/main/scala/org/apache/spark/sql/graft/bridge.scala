package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ↔ catalyst Expression
  * converters (Spark 4 moved these behind `private[sql]` when the Column
  * API was unified for Connect). Needed to expose custom Catalyst
  * expressions as user-facing `Column`s — same mechanism Spark's own
  * `functions` object uses internally.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
