package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum polynomial rolling
  * hash over all `n`-byte windows of the UTF-8 text (Rabin–Karp rolling
  * update, O(len) per document). Two documents sharing any n-byte window
  * that happens to produce the global minimum collide — the classic
  * min-sampled shingle fingerprint used for near-dup blocking.
  *
  * Native Catalyst expression with codegen: a UDF here would box every
  * row and break whole-stage codegen on the 100 TB text-pipeline path.
  */
case class RollingHashMin(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, "rolling_hash_min requires a string column")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minHash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashMin.minHash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHashMin {
  private val Base = 1000003L
  // Base^(n-1) mod 2^64, for removing the outgoing byte
  private def basePow(n: Int): Long = {
    var p = 1L; var i = 1
    while (i < n) { p *= Base; i += 1 }
    p
  }

  /** Min rolling hash over all n-byte windows; null semantics: returns
    * Long.MaxValue for texts shorter than n (no window). */
  def minHash(s: UTF8String, n: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length < n) return Long.MaxValue
    val pow = basePow(n)
    var h = 0L
    var i = 0
    while (i < n) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    var min = h
    while (i < bytes.length) {
      h = (h - (bytes(i - n) & 0xFF) * pow) * Base + (bytes(i) & 0xFF)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def rollingHashMin(text: Column, n: Int): Column =
    toColumn(RollingHashMin(toExpression(text), n))
}
