package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression conversions, which Spark 4 hides
  * behind `private[sql]`. Standard extension-library pattern: a tiny shim
  * compiled into the `org.apache.spark.sql` package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
