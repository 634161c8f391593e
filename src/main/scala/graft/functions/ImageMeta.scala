package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-format metadata decode — format + pixel dimensions parsed
  * from actual PNG / JPEG / GIF / BMP / WebP bytes with pure byte logic
  * (no codec library): PNG IHDR, JPEG SOF0–SOF15 segment scan, GIF
  * logical screen descriptor, BMP BITMAPINFOHEADER, WebP VP8 (lossy
  * frame tag) / VP8L (lossless bitstream) / VP8X (extended canvas).
  * Returns null for unrecognized or truncated content — multimodal
  * training-data columns routinely carry garbage, and a decode stage
  * must classify, not throw.
  *
  * A scalar codegen expression (static call inside whole-stage codegen),
  * so metadata extraction over a 100 TB binary column stays in the same
  * generated loop as the surrounding filters/projections; full pixel
  * decode (which DOES need codecs) belongs behind the partition-batched
  * kernel boundary (MultimodalOps.extractFeatures).
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.metaType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, "image_meta requires binary input")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("imageMeta")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.functions.ImageMeta.parse($c);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    le24(b, i).toLong | (u8(b, i + 3).toLong << 24)

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

  /** Parse format + dimensions; null if not a recognized image. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // ---- PNG: 8-byte signature, IHDR must be the first chunk
    if (u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A) {
      if (b.length < 24) return null
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
      return row("png", be32(b, 16), be32(b, 20))
    }
    // ---- JPEG: SOI then segment walk to the first SOF marker
    if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var p = 2
      while (p + 4 <= b.length) {
        if (u8(b, p) != 0xFF) return null
        val m = u8(b, p + 1)
        if (m == 0xFF) { p += 1 } // fill bytes before a marker
        else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { p += 2 }
        else if (m == 0xD9) return null // EOI before any SOF
        else {
          val segLen = be16(b, p + 2)
          if (segLen < 2) return null
          // SOF0..SOF15 carry dimensions; C4/C8/CC are DHT/JPG/DAC, not SOF
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (p + 9 > b.length) return null
            return row("jpeg", be16(b, p + 7), be16(b, p + 5))
          }
          p += 2 + segLen
        }
      }
      return null
    }
    // ---- GIF: "GIF87a"/"GIF89a" then LE16 logical-screen dims
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      return row("gif", le16(b, 6), le16(b, 8))
    }
    // ---- BMP: "BM" + BITMAPINFOHEADER at 14 (biHeight<0 = top-down)
    if (b(0) == 'B' && b(1) == 'M' && b.length >= 26) {
      return row("bmp", le32(b, 18).toInt, math.abs(le32(b, 22).toInt))
    }
    // ---- WebP: RIFF container, first chunk VP8 / VP8L / VP8X
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P' && b.length >= 30) {
      val fourcc = new String(Array(b(12), b(13), b(14), b(15)), "US-ASCII")
      fourcc match {
        case "VP8 " => // lossy: 3-byte frame tag, sync code, 14-bit LE dims
          if (u8(b, 23) != 0x9D || u8(b, 24) != 0x01 || u8(b, 25) != 0x2A) return null
          return row("webp", le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF)
        case "VP8L" => // lossless: signature byte then 14+14 bits (w-1, h-1)
          if (u8(b, 20) != 0x2F) return null
          val bits = le32(b, 21)
          return row("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        case "VP8X" => // extended: 24-bit LE canvas (w-1, h-1) after flags
          return row("webp", le24(b, 24).toLong + 1, le24(b, 27).toLong + 1)
        case _ => return null
      }
    }
    null
  }

  def imageMeta(content: Column): Column = toColumn(ImageMeta(toExpression(content)))
}
