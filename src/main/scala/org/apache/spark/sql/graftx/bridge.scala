/* Bridge into Spark's private[sql] surface. Kept to the minimum two
 * conversions a library adding native Catalyst expressions needs
 * (Column <-> Expression), same technique used by Spark connectors that
 * ship custom expressions. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
