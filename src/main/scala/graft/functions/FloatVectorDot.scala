package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Dot product of two float-array columns as a native codegen expression.
  *
  * The HOF formulation `aggregate(zip_with(a,b,*), 0d, +)` allocates an
  * intermediate array per invocation — measured 17µs/pair on 64-dim
  * vectors (69s for a 4M-pair near-dup scan). This expression is a tight
  * primitive loop over the two ArrayData buffers: no allocation, stays
  * inside whole-stage codegen.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVectorDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatVectorDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Requires both columns to be array<float>. */
  def dotF(a: Column, b: Column): Column =
    toColumn(FloatVectorDot(toExpression(a), toExpression(b)))
}
