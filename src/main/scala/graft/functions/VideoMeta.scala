package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL video-container metadata decode: dimensions, frame count and
  * frame rate parsed from actual RIFF/AVI bytes with pure byte logic —
  * the `LIST hdrl` walk to the `avih` main header (dwMicroSecPerFrame at
  * +0, dwTotalFrames at +16, dwWidth/dwHeight at +32/+36 per the
  * published AVIMAINHEADER layout). Unrecognized or truncated content
  * classifies as null. Scalar codegen expression; frame extraction and
  * per-frame rasterizing live in the partition-batched kernel
  * (MultimodalOps.demuxVideoFrames + decodeImage). */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMeta.metaType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, "video_meta requires binary input")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    VideoMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("videoMeta")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.functions.VideoMeta.parse($c);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fps", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private[graft] def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private[graft] def is4(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Parse AVI main-header metadata; null if not a recognized AVI. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 + 8) return null
    if (!is4(b, 0, "RIFF") || !is4(b, 8, "AVI ")) return null
    // top-level chunk walk for LIST hdrl
    var p = 12
    while (p + 8 <= b.length) {
      val sz = le32(b, p + 4)
      if (sz < 0 || sz > Int.MaxValue) return null
      if (is4(b, p, "LIST") && is4(b, p + 8, "hdrl")) {
        // walk inside hdrl for the avih chunk
        var q = p + 12
        val end = math.min(b.length.toLong, p + 8 + sz).toInt
        while (q + 8 <= end) {
          val csz = le32(b, q + 4)
          if (csz < 0 || csz > Int.MaxValue) return null
          if (is4(b, q, "avih")) {
            if (q + 8 + 40 > b.length || csz < 40) return null
            val usecPerFrame = le32(b, q + 8)
            val totalFrames = le32(b, q + 8 + 16)
            val w = le32(b, q + 8 + 32)
            val h = le32(b, q + 8 + 36)
            if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
                usecPerFrame <= 0) return null
            return new GenericInternalRow(Array[Any](UTF8String.fromString("avi"),
              w.toInt, h.toInt, totalFrames, (1000000L / usecPerFrame).toInt))
          }
          val nextQ = q.toLong + 8L + csz + (csz & 1L)
          if (nextQ > end) q = end else q = nextQ.toInt
        }
        return null // hdrl without avih
      }
      // Long advance: a hostile size near 2^31 must not wrap the index
      val next = p.toLong + 8L + sz + (sz & 1L)
      if (next > b.length) p = b.length else p = next.toInt
    }
    null
  }

  def videoMeta(content: Column): Column = toColumn(VideoMeta(toExpression(content)))
}
