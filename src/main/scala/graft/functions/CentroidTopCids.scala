package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `n` nearest centroid ids for a float-vector column, nearest first
  * (element 0 = the IVF assignment, the first `nProbe` = the probe set).
  *
  * Ranking key is dot(v, c)/‖c‖ — dividing by ‖v‖ is the same positive
  * scalar for every centroid, so the ordering equals cosine ordering at
  * half the arithmetic. Exact score ties break toward the smaller cid
  * (deterministic across runs and engines).
  *
  * Why an expression and not C struct columns + sort_array: the centroid
  * matrix embedded as C per-centroid array literals generates enormous
  * projection code — janino pays seconds PER distinct plan compiling it
  * (and the IVF pipeline builds three such plans: Lloyd assignment,
  * lists, probes). Here the matrix rides along as ONE reference object;
  * the generated code is a single call, whole-stage codegen stays intact,
  * and the hot loop is tight primitive JVM code (C dots + an O(C·n)
  * partial selection per row, no allocation beyond the n-int result).
  */
case class CentroidTopCids(child: Expression,
    cents: Array[Array[Float]], n: Int) extends UnaryExpression {

  require(cents.nonEmpty && n >= 1 && n <= cents.length,
    "CentroidTopCids: need 1 <= n <= number of centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // inverse norms precomputed once; a zero-norm centroid scores 0 for
  // every vector (same convention as the cosine re-rank's null guard)
  @transient private lazy val invNorms: Array[Double] =
    cents.map { c =>
      val nn = math.sqrt(c.map(x => x.toDouble * x).sum)
      if (nn == 0.0) 0.0 else 1.0 / nn
    }

  def topCids(v: ArrayData): ArrayData = {
    val c = cents.length
    val scores = new Array[Double](c)
    var i = 0
    while (i < c) {
      val cv = cents(i)
      val d = math.min(v.numElements(), cv.length)
      var s = 0.0
      var j = 0
      while (j < d) { s += v.getFloat(j).toDouble * cv(j); j += 1 }
      scores(i) = s * invNorms(i)
      i += 1
    }
    val out = new Array[Int](n)
    val taken = new Array[Boolean](c)
    var r = 0
    while (r < n) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      i = 0
      while (i < c) {
        // strict > keeps the SMALLEST cid on exact ties
        if (!taken(i) && scores(i) > bestScore) { best = i; bestScore = scores(i) }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = topCids(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTopCids", this,
      classOf[CentroidTopCids].getName)
    defineCodeGen(ctx, ev, v => s"$ref.topCids($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopCids =
    copy(child = newChild)
}

object CentroidTopCids {
  /** `vec` must be array<float>. */
  def topCids(vec: Column, cents: Array[Array[Float]], n: Int): Column =
    toColumn(CentroidTopCids(toExpression(vec), cents, n))
}
