package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

object ExprUtils {
  /** Integral division with Java truncation-toward-zero semantics (the SQL
    * `div` operator) — matches the reference's `l/1000` micros→millis
    * truncation (DebeziumTransform.scala:413) for all sign combinations. */
  def intDiv(a: Column, b: Long): Column =
    toColumn(IntegralDivide(toExpression(a), Literal(b)))
}
