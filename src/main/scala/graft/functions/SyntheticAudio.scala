package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL audio synthesis: id → actual RIFF/WAVE bytes,
  * encoded by the JDK's own codec (`javax.sound.sampled`) — PCM 16-bit
  * little-endian, 1–2 channels, constant amplitude. Every 7th id yields
  * deterministic non-audio garbage (decode stages classify, not crash).
  *
  * Sample rate, channel count, frame count, and amplitude are pure
  * functions of the id, so a SQL oracle predicts both the header
  * metadata and — because constant-amplitude PCM16 round-trips exactly —
  * the decoded sample statistics (mean/RMS/peak) without any codec.
  */
case class SyntheticAudio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = {
    require(child.dataType == LongType, "synthetic_audio requires a bigint id")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(input: Any): Any =
    SyntheticAudio.make(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SyntheticAudio.make($c)")

  override protected def withNewChildInternal(newChild: Expression): SyntheticAudio =
    copy(child = newChild)
}

object SyntheticAudio {

  /** Shared id→property formulas — the SQL oracles recompute these. */
  def sampleRate(id: Long): Int = Array(8000, 16000, 44100)((id % 3).toInt)
  def channels(id: Long): Int = 1 + (id % 2).toInt
  def frames(id: Long): Int = (200 + (id * 31) % 800).toInt
  def amp(id: Long): Int = ((id * 97) % 20000 - 10000).toInt
  def isGarbage(id: Long): Boolean = id % 7 == 0

  def make(id: Long): Array[Byte] = {
    if (isGarbage(id)) return garbage(id)
    val sr = sampleRate(id); val ch = channels(id)
    val n = frames(id); val a = amp(id)
    val pcm = new Array[Byte](n * ch * 2)
    var i = 0
    while (i < n * ch) {
      pcm(2 * i) = (a & 0xFF).toByte
      pcm(2 * i + 1) = ((a >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false) // PCM16 signed LE
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The JDK's WAVE writer, resolved ONCE per JVM: `AudioSystem.write`
    * re-resolves providers through a `synchronized` global
    * (JDK13Services.getProviders) on every call, so N parallel synthesis
    * tasks serialize on that lock — same fix as the reader side in
    * MultimodalOps.decodeAudio. Identical output bytes (this IS the
    * writer AudioSystem selects for WAVE). */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.collection.JavaConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no JDK WAVE writer"))
  }

  /** Deterministic non-audio bytes: no RIFF signature, md5-derived body. */
  private def garbage(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"garbage-audio-$id".getBytes("UTF-8"))
    val out = new Array[Byte](52)
    var i = 0
    while (i < out.length) { out(i) = md(i % md.length); i += 1 }
    out(0) = 'G'; out(1) = 'R'; out(2) = 'B'; out(3) = 'A'
    out
  }

  def syntheticAudio(id: Column): Column = toColumn(SyntheticAudio(toExpression(id)))
}
