package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.array
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) value of a point: each dimension is mapped to a
  * `2^bits`-bucket id through its own QUANTILE cut array (equal
  * frequency, so skewed columns still spread across the full id range —
  * equal-width bucketing would collapse them into a few ids), and the
  * ids' bits are interleaved most-significant-first. Sorting rows by
  * this value gives multi-dimensional locality: a file holding a
  * contiguous z-range spans a narrow range in EVERY dimension, which is
  * what makes min/max stats prune predicates on any single clustered
  * column (lexicographic sort only helps the leading one).
  *
  * The cut arrays ride along as ONE reference object (the same pattern
  * as [[CentroidTopCids]] — literal arrays in generated code would
  * janino-choke); the generated code is a single call into tight
  * primitive JVM code. Input is `array<double>` (caller casts each
  * dimension); a null dimension maps to bucket 0 (sorts first).
  */
case class ZValue(child: Expression,
    cuts: Array[Array[Double]], bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 16, "ZValue: need 1 <= bits <= 16")
  require(cuts.nonEmpty && cuts.length * bits <= 63,
    s"ZValue: ${cuts.length} dims x $bits bits must fit a positive long")
  require(cuts.forall(_.length < (1 << bits)),
    s"ZValue: at most ${(1 << bits) - 1} cuts per dimension for $bits bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def zOf(v: ArrayData): Long = {
    val dims = cuts.length
    var z = 0L
    var d = 0
    while (d < dims) {
      val id =
        if (d >= v.numElements() || v.isNullAt(d)) 0
        else {
          val r = java.util.Arrays.binarySearch(cuts(d), v.getDouble(d))
          if (r >= 0) r + 1 else -(r + 1) // # of cuts <= x, in [0, 2^bits)
        }
      // most-significant-first interleave (true Morton order)
      var b = 0
      while (b < bits) {
        z |= ((id >> b) & 1L) << (b.toLong * dims + (dims - 1 - d))
        b += 1
      }
      d += 1
    }
    z
  }

  override def nullSafeEval(v: Any): Any = zOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zvalue", this, classOf[ZValue].getName)
    defineCodeGen(ctx, ev, v => s"$ref.zOf($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): ZValue =
    copy(child = newChild)
}

object ZValue {
  /** `dims` must already be cast to double, one per `cuts` entry. */
  def z(dims: Seq[Column], cuts: Array[Array[Double]], bits: Int = 8): Column =
    toColumn(ZValue(toExpression(array(dims: _*)), cuts, bits))
}
