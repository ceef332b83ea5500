package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. ExpressionUtils is private[sql]
  * in Spark 4, so this lives under org.apache.spark.sql — the standard
  * technique Spark-extension libraries use to expose custom Expressions
  * as Columns. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
