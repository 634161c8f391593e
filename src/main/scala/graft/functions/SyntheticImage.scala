package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL image synthesis: id → actual encoded file bytes.
  *
  * PNG and JPEG are produced by the JDK's own codecs (`javax.imageio`,
  * headless-safe); the three WebP container variants (VP8 lossy frame,
  * VP8L lossless bitstream, VP8X extended canvas) are built byte-by-byte
  * per the RIFF/WebP spec. Every 7th id yields deterministic non-image
  * garbage, because a 100 TB multimodal column always carries some — a
  * decode stage must classify it, not die on it.
  *
  * Format, dimensions, and fill color are pure functions of the id, so a
  * SQL oracle can predict the decoded metadata (and, for lossless PNG,
  * the exact pixel statistics) without running any codec. Codegen
  * expression so per-row synthesis stays inside the whole-stage loop.
  */
case class SyntheticImage(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = {
    require(child.dataType == LongType, "synthetic_image requires a bigint id")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    SyntheticImage.make(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SyntheticImage.make($c)")

  override protected def withNewChildInternal(newChild: Expression): SyntheticImage =
    copy(child = newChild)
}

object SyntheticImage {

  // ImageIO defaults to a disk-backed ImageInputStream cache — a TEMP
  // FILE per encode/decode call. In-memory streams only (per-executor
  // static init; measured 4× on the per-frame video decode).
  javax.imageio.ImageIO.setUseCache(false)

  /** Shared id→property formulas — the SQL oracles recompute these. */
  def width(id: Long): Int = (8 + (id * 37) % 120).toInt
  def height(id: Long): Int = (8 + (id * 53) % 120).toInt
  def rgb(id: Long): Int = ((id * 2654435761L) & 0xFFFFFF).toInt
  def isGarbage(id: Long): Boolean = id % 7 == 0

  /** id → real encoded bytes: id%5 picks png / jpeg / webp-VP8 /
    * webp-VP8L / webp-VP8X; id%7==0 overrides to non-image garbage. */
  def make(id: Long): Array[Byte] = {
    if (isGarbage(id)) return garbage(id)
    val w = width(id); val h = height(id)
    id % 5 match {
      case 0 => encode("png", w, h, rgb(id))
      case 1 => encode("jpg", w, h, rgb(id))
      case 2 => webpVp8(w, h)
      case 3 => webpVp8l(w, h)
      case _ => webpVp8x(w, h)
    }
  }

  /** Solid-color encode through the JDK codec (no Graphics2D — setRGB
    * keeps the AWT surface minimal and headless-proof). */
  private[graft] def encode(fmt: String, w: Int, h: Int, color: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, color); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no JDK encoder for $fmt")
    bos.toByteArray
  }

  private def le16b(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le24b(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def riff(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val chunk = fourcc.getBytes("US-ASCII") ++ le32b(payload.length) ++ padded
    "RIFF".getBytes("US-ASCII") ++ le32b(4 + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }

  /** Lossy WebP: keyframe tag, 0x9D012A sync code, 14-bit LE dims. */
  private[graft] def webpVp8(w: Int, h: Int): Array[Byte] =
    riff("VP8 ", Array[Byte](0x10, 0, 0, 0x9D.toByte, 0x01, 0x2A) ++
      le16b(w) ++ le16b(h) ++ Array.fill[Byte](12)(0))

  /** Lossless WebP: 0x2F signature then (w-1, h-1) packed 14+14 bits LE. */
  private[graft] def webpVp8l(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    riff("VP8L", Array[Byte](0x2F) ++ le32b(bits) ++ Array.fill[Byte](8)(0))
  }

  /** Extended WebP: flags + reserved, then 24-bit LE (w-1, h-1) canvas. */
  private[graft] def webpVp8x(w: Int, h: Int): Array[Byte] =
    riff("VP8X", Array[Byte](0, 0, 0, 0) ++ le24b(w - 1) ++ le24b(h - 1))

  /** Deterministic non-image bytes: no known signature, md5-derived body. */
  private def garbage(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"garbage-$id".getBytes("UTF-8"))
    val out = new Array[Byte](48)
    var i = 0
    while (i < out.length) { out(i) = md(i % md.length); i += 1 }
    out(0) = 'G'; out(1) = 'R'; out(2) = 'B'; out(3) = 'G'
    out
  }

  def syntheticImage(id: Column): Column = toColumn(SyntheticImage(toExpression(id)))
}
