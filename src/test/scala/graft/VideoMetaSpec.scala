package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SyntheticImage, SyntheticVideo, VideoMeta}
import graft.operators.MultimodalOps

/** Real-container validation for the video path: synthesized RIFF/AVI
  * bytes must parse back to exact header metadata, demux into the right
  * number of MJPEG chunks, and every chunk must rasterize through the
  * JDK JPEG codec at the declared dimensions. */
class VideoMetaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def meta(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] =
    Option(VideoMeta.parse(b)).map(r => (r.getUTF8String(0).toString,
      r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))

  test("AVI main header round-trips exactly") {
    for (id <- Seq(1L, 2L, 3L, 23L, 95L)) {
      assert(meta(SyntheticVideo.make(id)) === Some(("avi",
        SyntheticImage.width(id), SyntheticImage.height(id),
        SyntheticVideo.nFrames(id).toLong, SyntheticVideo.fps(id))), s"id=$id")
    }
  }

  test("garbage and truncation classify as null") {
    assert(meta(SyntheticVideo.make(7L)) === None) // garbage id
    assert(meta("RIFFxxxxWAVE not a video".getBytes("US-ASCII")) === None)
    assert(meta(SyntheticVideo.make(1L).take(40)) === None)
    assert(meta(Array.empty[Byte]) === None)
    // hostile size on a skipped chunk near 2^31 must not wrap the index
    val hostile = SyntheticVideo.make(1L).clone()
    hostile(16) = 0xFF.toByte; hostile(17) = 0xFF.toByte
    hostile(18) = 0xFF.toByte; hostile(19) = 0x7F.toByte // LIST size = 2^31-1
    hostile(20) = 'x'; hostile(21) = 'x'; hostile(22) = 'x'; hostile(23) = 'x' // not hdrl → skipped
    assert(meta(hostile) === None)
    assert(MultimodalOps.demuxVideoFrames(
      spark.createDataFrame(java.util.List.of(org.apache.spark.sql.Row(hostile)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.BinaryType)))), "content").count() === 0)
  }

  test("demux + JDK JPEG rasterize: every frame decodes at declared dims") {
    val df = MultimodalOps.decodeImage(
      MultimodalOps.demuxVideoFrames(
        spark.range(0, 40).select(col("id"),
          SyntheticVideo.syntheticVideo(col("id")).as("content")), "content")
        .drop("content"), "frame")
    val rows = df.select("id", "frame_idx", "format", "width", "height", "mean_r")
      .collect().groupBy(_.getLong(0))
    for (id <- 0L until 40L) {
      if (SyntheticVideo.isGarbage(id)) {
        assert(!rows.contains(id), s"id=$id: garbage must demux to zero rows")
      } else {
        val fs = rows(id).sortBy(_.getInt(1))
        assert(fs.length === SyntheticVideo.nFrames(id), s"id=$id")
        assert(fs.map(_.getInt(1)).toSeq === (0 until fs.length), s"id=$id")
        val c = SyntheticImage.rgb(id)
        fs.foreach { r =>
          assert(r.getString(2) === "jpeg", s"id=$id")
          assert(r.getInt(3) === SyntheticImage.width(id), s"id=$id")
          assert(r.getInt(4) === SyntheticImage.height(id), s"id=$id")
          // real (lossy) decode of a solid fill: tight tolerance
          assert(math.abs(r.getDouble(5) - ((c >> 16) & 0xFF)) < 4.0, s"id=$id")
        }
      }
    }
  }

  test("header decode stays in whole-stage codegen") {
    val df = spark.range(0, 30)
      .select(col("id"), SyntheticVideo.syntheticVideo(col("id")).as("content"))
      .select(col("id"), VideoMeta.videoMeta(col("content")).as("m"))
    assert(df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
    val bad = df.filter(
      when(col("id") % 7 === 0, col("m").isNotNull)
        .otherwise(col("m").isNull ||
          col("m.n_frames") =!= lit(3) + col("id") * 13 % 5 ||
          col("m.fps") =!= when(col("id") % 3 === 0, 10)
            .when(col("id") % 3 === 1, 20).otherwise(25)))
    assert(bad.count() === 0)
  }
}
