package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression conversions, which Spark 4 hides
  * behind `private[sql]`. Standard extension-library pattern: a tiny shim
  * compiled into the `org.apache.spark.sql` package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True iff the column is a `col.desc`-style sort-order node. Spark 4
    * Columns wrap `internal.ColumnNode`s (private[sql]), not catalyst
    * expressions, so the direction is only visible from this package. */
  def isDescending(c: Column): Boolean = c.node match {
    case s: internal.SortOrder => s.sortDirection == internal.SortOrder.Descending
    case _ => false
  }
}
