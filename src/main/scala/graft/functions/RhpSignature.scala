package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `array<float>` vector: bit b is
  * the sign of the dot product with a deterministic pseudo-random
  * hyperplane, all `bits` projections accumulated in ONE pass over the
  * vector (the zip_with/sequence/aggregate HOF formulation re-walks the
  * vector once per bit with interpreted lambdas and per-element hash
  * calls — measured ~10× slower at 8 bits × 16 tables).
  *
  * Hyperplane components are derived from a splitmix64 mix of
  * (seed, bit, dim) mapped to [-1, 1) — reproducible anywhere with no
  * stored model.
  */
case class RhpSignature(child: Expression, bits: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == ArrayType(FloatType, containsNull = true) ||
      child.dataType == ArrayType(FloatType, containsNull = false),
      "rhp_signature requires array<float>")
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    RhpSignature.signature(input.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RhpSignature.signature($c, $bits, $seed)")

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
}

object RhpSignature {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (seed, bit, dim) in [-1, 1). */
  @inline private def plane(seed: Int, b: Int, i: Int): Double =
    (mix64(seed.toLong * 0x632BE59BD9B4E019L + b.toLong * 0x9E3779B97F4A7C15L + i) >>> 11) *
      (2.0 / (1L << 53)) - 1.0

  def signature(vec: ArrayData, bits: Int, seed: Int): Long = {
    val n = vec.numElements()
    val proj = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = vec.getFloat(i).toDouble
        var b = 0
        while (b < bits) { proj(b) += v * plane(seed, b, i); b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (proj(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }

  def rhpSignature(vec: Column, bits: Int, seed: Int): Column =
    toColumn(RhpSignature(toExpression(vec), bits, seed))
}
