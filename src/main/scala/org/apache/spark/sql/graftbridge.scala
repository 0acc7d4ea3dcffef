package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column <-> Expression converters, needed
 * to expose custom Catalyst expressions (e.g. [[graft.functions.DotProduct]])
 * as user-facing `Column`s. Lives in the `org.apache.spark.sql` package solely
 * for access; contains no logic.
 */
object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
