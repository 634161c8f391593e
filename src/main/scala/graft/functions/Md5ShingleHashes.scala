package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit md5-prefix hashes of every DISTINCT `n`-character window of the
  * text, in one pass over the UTF-8 bytes.
  *
  * The value of each hash is bit-identical to the SQL-portable
  * formulation `CAST('0x' || substr(md5(shingle),1,8) AS BIGINT)` (the
  * first 4 digest bytes as an unsigned big-endian int), so DuckDB oracles
  * reproduce it — but without the `transform(sequence(...), substr)`
  * shingle explosion (substr re-seeks from the string start: O(len²) per
  * document), the per-shingle hex-string materialization, or the
  * `conv(hex,16,10)` string parse. Windows are counted in CODE POINTS to
  * match both engines' `substr` semantics. Distinctness is by window
  * text, matching `array_distinct` / `list_distinct` upstream of the
  * hash (relevant to per-bit majority votes, where duplicate shingles
  * must count once).
  */
case class Md5ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, "md5_shingle_hashes requires a string column")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    Md5ShingleHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ShingleHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)
}

object Md5ShingleHashes {

  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets (UTF-8 continuation bytes have 10xxxxxx)
    var cp = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xC0) != 0x80) cp += 1; i += 1 }
    if (cp < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](cp + 1)
    var c = 0; i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(cp) = bytes.length

    val md = localMd5.get()
    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](cp - n + 1)
    var w = 0
    while (w <= cp - n) {
      val from = starts(w); val len = starts(w + n) - from
      if (seen.add(UTF8String.fromBytes(bytes, from, len))) {
        md.reset()
        md.update(bytes, from, len)
        val d = md.digest()
        out += ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
               ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  def md5ShingleHashes(text: Column, n: Int): Column =
    toColumn(Md5ShingleHashes(toExpression(text), n))
}
