package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * supported internal accessor — same approach Delta/Iceberg use). */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** FULL catalyst conversion of a Column's node tree: `toExpression`
    * yields a lazy `ColumnNodeExpression` wrapper (fine as a plan child,
    * opaque to pattern matching); this walks the ColumnNode tree into
    * real catalyst nodes (GreaterThan, In, And, ...) so plan-side code —
    * the manifest-stats pruner — can interpret the predicate shape. */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
