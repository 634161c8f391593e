package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL video synthesis: id → an actual RIFF/AVI container
  * carrying MJPEG frames — each frame a genuine JPEG encoded by the
  * JDK's own codec. The container (LIST hdrl → avih/strl, LIST movi →
  * 00dc chunks) follows the published AVI layout byte for byte, so any
  * AVI-aware reader can demux it; `VideoMeta` parses the header and
  * `MultimodalOps.demuxVideoFrames` + `decodeImage` rasterize the
  * frames end to end with zero external libraries. Every 7th id yields
  * deterministic non-video garbage. Dimensions, frame count and frame
  * rate are pure functions of the id for SQL-oracle prediction. */
case class SyntheticVideo(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = {
    require(child.dataType == LongType, "synthetic_video requires a bigint id")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    SyntheticVideo.make(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SyntheticVideo.make($c)")

  override protected def withNewChildInternal(newChild: Expression): SyntheticVideo =
    copy(child = newChild)
}

object SyntheticVideo {

  /** Shared id→property formulas — the SQL oracles recompute these.
    * Dimensions and fill color reuse SyntheticImage's formulas. */
  def nFrames(id: Long): Int = (3 + (id * 13) % 5).toInt
  def fps(id: Long): Int = Array(10, 20, 25)((id % 3).toInt)
  def isGarbage(id: Long): Boolean = id % 7 == 0

  private def le16b(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32b(v: Long): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val padded = if (data.length % 2 == 1) data :+ 0.toByte else data
    fcc(id) ++ le32b(data.length) ++ padded
  }
  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(listType) ++ children)

  def make(id: Long): Array[Byte] = {
    if (isGarbage(id)) return garbage(id)
    val w = SyntheticImage.width(id); val h = SyntheticImage.height(id)
    val n = nFrames(id); val rate = fps(id)
    val usecPerFrame = 1000000 / rate // 10/20/25 divide exactly
    val frame = SyntheticImage.encode("jpg", w, h, SyntheticImage.rgb(id))

    // AVIMAINHEADER: usec/frame, maxBytesPerSec, padding, flags,
    // totalFrames, initialFrames, streams, bufSize, width, height, rsvd[4]
    val avih = chunk("avih",
      le32b(usecPerFrame) ++ le32b(frame.length.toLong * rate) ++ le32b(0) ++
        le32b(0x10 /* AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-ish flags */) ++
        le32b(n) ++ le32b(0) ++ le32b(1) ++ le32b(frame.length) ++
        le32b(w) ++ le32b(h) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0))
    // AVISTREAMHEADER for the single MJPEG video stream
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32b(0) ++ le16b(0) ++ le16b(0) ++
        le32b(0) ++ le32b(1) ++ le32b(rate) ++ le32b(0) ++ le32b(n) ++
        le32b(frame.length) ++ le32b(0xFFFFFFFFL) ++ le32b(0) ++
        le16b(0) ++ le16b(0) ++ le16b(w) ++ le16b(h))
    // BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = chunk("strf",
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
        fcc("MJPG") ++ le32b(w.toLong * h * 3) ++ le32b(0) ++ le32b(0) ++
        le32b(0) ++ le32b(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", Array.fill(n)(chunk("00dc", frame)).flatten.toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32b(body.length) ++ body
  }

  /** Deterministic non-video bytes: no RIFF signature, md5-derived body. */
  private def garbage(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"garbage-video-$id".getBytes("UTF-8"))
    val out = new Array[Byte](64)
    var i = 0
    while (i < out.length) { out(i) = md(i % md.length); i += 1 }
    out(0) = 'G'; out(1) = 'R'; out(2) = 'B'; out(3) = 'V'
    out
  }

  def syntheticVideo(id: Column): Column = toColumn(SyntheticVideo(toExpression(id)))
}
