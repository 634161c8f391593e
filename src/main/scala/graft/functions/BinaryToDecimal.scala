package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Decode a Kafka-Connect `org.apache.kafka.connect.data.Decimal`:
  * two's-complement unscaled BigInteger bytes + a per-message scale →
  * DecimalType(precision, scale).
  *
  * The reference does this per-row in JVM code (DebeziumTransform.scala:
  * 334-341: Base64 decode → BigInteger → BigDecimal / 10^scale). Spark has
  * no built-in for arbitrary-precision bytes→decimal, so this is a native
  * Catalyst expression with codegen — it stays inside whole-stage codegen
  * instead of forcing an object-mode boundary.
  *
  * `scaleExpr` is usually a literal (declared schema) but may come from the
  * per-message schema (`parameters.scale`) in per-message validation mode.
  */
case class BinaryToDecimal(bytes: Expression, scaleExpr: Expression,
    precision: Int, scale: Int)
  extends BinaryExpression {

  override def left: Expression = bytes
  override def right: Expression = scaleExpr
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true

  override def nullSafeEval(bytesVal: Any, scaleVal: Any): Any =
    BinaryToDecimal.decode(bytesVal.asInstanceOf[Array[Byte]],
      scaleVal.asInstanceOf[Int], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s) =>
      s"""${ev.value} = graft.functions.BinaryToDecimal.decode($b, $s, $precision, $scale);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinaryToDecimal =
    copy(bytes = newLeft, scaleExpr = newRight)
}

object BinaryToDecimal {
  /** Static decode helper shared by interpreted + generated code.
    * Returns null when the value cannot fit (precision overflow). */
  def decode(bytes: Array[Byte], msgScale: Int, precision: Int, scale: Int): Decimal = {
    val bd = new JBigDecimal(new BigInteger(bytes), msgScale)
    val d = Decimal(bd)
    if (d.changePrecision(precision, scale)) d else null
  }

  def binaryToDecimal(bytes: Column, scale: Column, precision: Int, declScale: Int): Column =
    toColumn(BinaryToDecimal(toExpression(bytes), toExpression(scale),
      precision, declScale))
}
