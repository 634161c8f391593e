package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** CROSS-ENGINE-PORTABLE random-hyperplane signature of an `array<float>`
  * vector: bit b is the sign of an EXACT 64-bit integer dot product
  * between the quantized vector `q_j = floor(v_j * scale)` and an
  * md5-derived integer hyperplane
  * `g(b,j) = md5_32("rhp|seed|b|j") % 65536 - 32768`.
  *
  * All-integer arithmetic means a SQL oracle (DuckDB) reproduces every
  * bit exactly — float dot products are order-of-summation dependent in
  * the last ulp, so a float formulation could flip a near-zero sign bit
  * between engines. Magnitudes stay far inside int64: |g| < 2^15 and
  * |q| < 2^31 would need |v| > 2^21 at scale 1024; 64 terms of ±2^46
  * cannot overflow. One pass over the vector for all bits (same shape as
  * [[RhpSignature]], the non-portable splitmix64 float variant kept for
  * throughput paths). Hyperplanes are memoized per (seed, bits) on each
  * executor (one md5 per (bit, dim), amortized across all rows).
  */
case class PortableRhpSignature(child: Expression, bits: Int, seed: Int, scale: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == ArrayType(FloatType, containsNull = true) ||
      child.dataType == ArrayType(FloatType, containsNull = false),
      "portable_rhp_signature requires array<float>")
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    PortableRhpSignature.signature(input.asInstanceOf[ArrayData], bits, seed, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableRhpSignature.signature($c, $bits, $seed, $scale)")

  override protected def withNewChildInternal(newChild: Expression): PortableRhpSignature =
    copy(child = newChild)
}

object PortableRhpSignature {

  // planes(seed -> growable [bit][dim] table); md5 is computed once per
  // (seed, bit, dim) per executor
  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Array[Short]]]()

  /** `g(b,j) = (first 4 md5 bytes of "rhp|seed|b|j" as unsigned) % 65536
    * - 32768` — matches the DuckDB formulation
    * `CAST('0x'||substr(md5(s),1,8) AS BIGINT) % 65536 - 32768`. */
  private[graft] def plane(seed: Int, b: Int, j: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s"rhp|$seed|$b|$j".getBytes(StandardCharsets.UTF_8))
    val u = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    (u % 65536L).toInt - 32768
  }

  private def planes(seed: Int, bits: Int, dims: Int): Array[Array[Short]] = {
    val cached = planeCache.get((seed, bits))
    if (cached != null && cached(0).length >= dims) return cached
    planeCache.synchronized {
      val again = planeCache.get((seed, bits))
      if (again != null && again(0).length >= dims) return again
      val t = Array.tabulate(bits, dims)((b, j) => plane(seed, b, j).toShort)
      planeCache.put((seed, bits), t)
      t
    }
  }

  def signature(vec: ArrayData, bits: Int, seed: Int, scale: Int): Long = {
    val n = vec.numElements()
    val g = planes(seed, bits, n)
    val dot = new Array[Long](bits)
    var j = 0
    while (j < n) {
      val q =
        if (vec.isNullAt(j)) 0L
        else math.floor(vec.getFloat(j).toDouble * scale).toLong
      if (q != 0L) {
        var b = 0
        while (b < bits) { dot(b) += g(b)(j) * q; b += 1 }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (dot(b) >= 0L) sig |= 1L << b; b += 1 }
    sig
  }

  def portableRhpSignature(vec: Column, bits: Int, seed: Int = 42,
      scale: Int = 1024): Column =
    toColumn(PortableRhpSignature(toExpression(vec), bits, seed, scale))
}
