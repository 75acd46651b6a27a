package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: lift a Catalyst Expression into the
  * public Column API (Spark 4 moved this behind
  * `classic.ExpressionUtils`). The standard pattern for libraries that
  * ship native expressions without forking Spark. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
