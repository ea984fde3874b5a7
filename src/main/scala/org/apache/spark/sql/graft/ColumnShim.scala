package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** `private[sql]` door: `classic.ExpressionUtils` is Spark 4's bridge
  * between the public `Column` (a ColumnNode wrapper since the
  * sql-api split) and catalyst `Expression`s. Custom expressions that
  * carry a non-expression payload (e.g. [[graft.functions.DvContains]]
  * with its bitmap index) cannot come in through the function
  * registry, so this is the one sanctioned crossing. */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
