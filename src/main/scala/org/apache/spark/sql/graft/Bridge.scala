package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression plumbing (Spark 4
  * moved Column onto ColumnNode for Connect; `classic.ExpressionUtils` is
  * the sanctioned conversion for engine-side extensions). Keeping this one
  * file inside the spark namespace confines the privileged access.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
