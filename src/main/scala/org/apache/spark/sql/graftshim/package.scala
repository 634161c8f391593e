package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * supported internal accessor — same approach Delta/Iceberg use). */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
