package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio-format metadata decode: channels, sample rate, bit depth
  * and frame count parsed from actual RIFF/WAVE bytes with pure byte
  * logic (chunk walk to `fmt ` + `data`, word-aligned sizes per the RIFF
  * spec). PCM only — compressed `fmt` codes and unrecognized or
  * truncated content classify as null; a metadata pass over a 100 TB
  * audio column must bin garbage, not die on it.
  *
  * Scalar codegen expression (static call inside whole-stage codegen) —
  * full sample decode belongs in the partition-batched kernel
  * (MultimodalOps.decodeAudio, which runs the JDK's own WAV codec).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.metaType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, "audio_meta requires binary input")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("audioMeta")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.functions.AudioMeta.parse($c);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def is(b: Array[Byte], i: Int, s: String): Boolean = {
    var k = 0
    while (k < s.length) { if (b(i + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  /** Parse PCM WAV metadata; null if not a recognized PCM RIFF/WAVE. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!is(b, 0, "RIFF") || !is(b, 8, "WAVE")) return null
    var p = 12
    var audioFmt = -1; var channels = -1; var sampleRate = -1L
    var bits = -1; var dataLen = -1L
    while (p + 8 <= b.length && (audioFmt < 0 || dataLen < 0)) {
      val sz = le32(b, p + 4)
      if (sz < 0 || sz > Int.MaxValue) return null
      // the chunk's own size must cover the 16 PCM fmt bytes — an
      // undersized fmt chunk would otherwise read the NEXT chunk's bytes
      // as format fields and misclassify garbage as valid PCM metadata
      if (is(b, p, "fmt ") && sz >= 16 && p + 24 <= b.length) {
        audioFmt = le16(b, p + 8)
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        bits = le16(b, p + 22)
      } else if (is(b, p, "data")) {
        dataLen = math.min(sz, (b.length - p - 8).toLong) // tolerate truncated tails
      }
      // Long advance: a hostile size near 2^31 must not wrap the index
      val next = p.toLong + 8L + sz + (sz & 1L) // RIFF chunks are word-aligned
      if (next > b.length) p = b.length else p = next.toInt
    }
    if (audioFmt != 1 || channels <= 0 || bits <= 0 || bits % 8 != 0 ||
        sampleRate <= 0 || sampleRate > Int.MaxValue || dataLen < 0) return null
    val frameBytes = channels * (bits / 8)
    new GenericInternalRow(Array[Any](UTF8String.fromString("wav"),
      channels, sampleRate.toInt, bits, dataLen / frameBytes))
  }

  def audioMeta(content: Column): Column = toColumn(AudioMeta(toExpression(content)))
}
