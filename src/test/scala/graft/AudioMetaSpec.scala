package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioMeta, SyntheticAudio}
import graft.operators.MultimodalOps

/** Real-file-format validation for the audio path: WAV bytes the JDK's
  * own codec produced must parse back to exact metadata, PCM sample
  * statistics must round-trip exactly, and malformed content must
  * classify as null rather than throw. */
class AudioMetaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def encodeWav(sr: Int, ch: Int, frames: Int, amp: Short): Array[Byte] = {
    val pcm = new Array[Byte](frames * ch * 2)
    for (i <- 0 until frames * ch) {
      pcm(2 * i) = (amp & 0xFF).toByte
      pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def meta(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] =
    Option(AudioMeta.parse(b)).map(r => (r.getUTF8String(0).toString,
      r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))

  test("parses real JDK-encoded WAV metadata exactly") {
    for ((sr, ch, n) <- Seq((8000, 1, 1), (16000, 2, 500), (44100, 2, 999)))
      assert(meta(encodeWav(sr, ch, n, 1234)) === Some(("wav", ch, sr, 16, n.toLong)))
  }

  test("non-PCM format code, garbage, and truncation classify as null") {
    assert(meta("RIFFnot really a wave file at all, padding to 44+ bytes....."
      .getBytes("US-ASCII")) === None)
    assert(meta(Array.empty[Byte]) === None)
    val wav = encodeWav(16000, 1, 100, 5)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // fmt code 3 = IEEE float, not PCM
    assert(meta(nonPcm) === None)
    assert(meta(wav.take(30)) === None) // truncated before the data chunk
    // hostile chunk size near 2^31 must not wrap the index (classify, not AIOOBE)
    val hostile = wav.clone()
    hostile(16) = 0xFF.toByte; hostile(17) = 0xFF.toByte
    hostile(18) = 0xFF.toByte; hostile(19) = 0x7F.toByte
    assert(meta(hostile) === None)
    // undersized fmt chunk (sz < 16): the walk must NOT read the next
    // chunk's bytes as format fields — it skips 8+sz ahead, lands
    // mid-chunk, and the scan classifies rather than misparsing
    val tiny = wav.clone()
    tiny(16) = 4; tiny(17) = 0; tiny(18) = 0; tiny(19) = 0
    assert(meta(tiny) === None)
  }

  test("synthesize→header-decode end to end in whole-stage codegen") {
    val df = spark.range(0, 150)
      .select(col("id"), SyntheticAudio.syntheticAudio(col("id")).as("content"))
      .select(col("id"), AudioMeta.audioMeta(col("content")).as("m"))
    val codegenned = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty)
    val bad = df.filter(
      when(col("id") % 7 === 0, col("m").isNotNull)
        .otherwise(col("m").isNull ||
          col("m.channels") =!= (lit(1) + col("id") % 2).cast("int") ||
          col("m.n_frames") =!= lit(200) + col("id") * 31 % 800 ||
          col("m.sample_rate") =!= when(col("id") % 3 === 0, 8000)
            .when(col("id") % 3 === 1, 16000).otherwise(44100)))
    assert(bad.count() === 0)
  }

  test("decodeAudio: AIFF (big-endian) decodes with the real container label and exact stats") {
    val amp: Short = 1234
    val pcm = new Array[Byte](300 * 2)
    for (i <- 0 until 300) { // big-endian samples for the AIFF writer
      pcm(2 * i) = ((amp >> 8) & 0xFF).toByte; pcm(2 * i + 1) = (amp & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, true)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 300L),
      AudioFileFormat.Type.AIFF, bos)
    val df = MultimodalOps.decodeAudio(
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(bos.toByteArray)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.BinaryType)))), "content")
    val r = df.select("format", "channels", "sample_rate", "n_frames",
      "mean_amp", "rms_amp", "peak_amp").head()
    assert(r.getString(0) === "aif")
    assert(r.getInt(1) === 1 && r.getInt(2) === 8000 && r.getLong(3) === 300L)
    assert(r.getDouble(4) === 1234.0 && r.getDouble(5) === 1234.0 && r.getInt(6) === 1234)
  }

  test("decodeAudio: real JDK PCM decode — exact mean/RMS/peak, garbage null") {
    val df = MultimodalOps.decodeAudio(
      spark.range(0, 90).select(col("id"),
        SyntheticAudio.syntheticAudio(col("id")).as("content")), "content")
    val rows = df.select("id", "format", "channels", "sample_rate", "n_frames",
      "mean_amp", "rms_amp", "peak_amp").collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 90L) {
      val r = rows(id)
      if (SyntheticAudio.isGarbage(id)) {
        assert(r.isNullAt(1) && r.isNullAt(4) && r.isNullAt(5), s"id=$id")
      } else {
        val a = SyntheticAudio.amp(id)
        assert(r.getString(1) === "wav")
        assert(r.getInt(2) === SyntheticAudio.channels(id), s"id=$id")
        assert(r.getInt(3) === SyntheticAudio.sampleRate(id), s"id=$id")
        assert(r.getLong(4) === SyntheticAudio.frames(id).toLong, s"id=$id")
        assert(r.getDouble(5) === a.toDouble, s"id=$id")          // exact: constant fill
        assert(r.getDouble(6) === math.abs(a).toDouble, s"id=$id") // sqrt of perfect square
        assert(r.getInt(7) === math.abs(a), s"id=$id")
      }
    }
  }
}
