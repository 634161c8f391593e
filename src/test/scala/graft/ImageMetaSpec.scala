package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageMeta, SyntheticImage}

/** Real-file-format validation for the image metadata decoder: bytes the
  * JDK's own codecs produced (not our synthesizer) must parse back to the
  * exact dimensions, hand-built header sequences must exercise every
  * branch of the segment walkers, and malformed content must classify as
  * null rather than throw. */
class ImageMetaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK $fmt encoder missing")
    bos.toByteArray
  }

  private def dims(b: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageMeta.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("parses real JDK-encoded PNG and JPEG, incl. dims over one byte") {
    for ((w, h) <- Seq((8, 8), (300, 517), (1024, 3), (1, 1))) {
      assert(dims(encode("png", w, h)) === Some(("png", w, h)))
      assert(dims(encode("jpg", w, h)) === Some(("jpeg", w, h)))
    }
  }

  test("parses real JDK-encoded GIF and BMP, and decodeImage rasterizes them exactly") {
    for ((w, h) <- Seq((9, 13), (300, 41))) {
      assert(dims(encode("gif", w, h)) === Some(("gif", w, h)))
      assert(dims(encode("bmp", w, h)) === Some(("bmp", w, h)))
    }
    // both are lossless for a solid fill → exact pixel means end to end
    import graft.operators.MultimodalOps
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    def solid(fmt: String): Array[Byte] = {
      val img = new BufferedImage(12, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 12) img.setRGB(x, y, 0x3366CC)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos)); bos.toByteArray
    }
    val df = spark.createDataFrame(
      java.util.List.of(Row(solid("gif")), Row(solid("bmp"))),
      StructType(Seq(StructField("content", BinaryType))))
    val rows = MultimodalOps.decodeImage(df, "content")
      .select("format", "width", "height", "mean_r", "mean_g", "mean_b")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows("gif") === ((12, 8, 0x33.toDouble, 0x66.toDouble, 0xCC.toDouble)))
    assert(rows("bmp") === ((12, 8, 0x33.toDouble, 0x66.toDouble, 0xCC.toDouble)))
  }

  test("JPEG segment walk skips COM/DQT/DHT and reads progressive SOF2") {
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](0xFF.toByte, marker.toByte,
        (((body.length + 2) >> 8) & 0xFF).toByte, ((body.length + 2) & 0xFF).toByte) ++ body
    val sof2 = seg(0xC2, Array[Byte](8, 0x01, 0x05, 0x02, 0x03, 3)) // h=261 w=515
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      seg(0xFE, "a comment".getBytes("US-ASCII")) ++ // COM
      seg(0xDB, Array.fill[Byte](65)(1)) ++          // DQT
      seg(0xC4, Array.fill[Byte](19)(2)) ++          // DHT (0xC4 is NOT a SOF)
      sof2 ++ Array[Byte](0xFF.toByte, 0xD9.toByte)
    assert(dims(jpg) === Some(("jpeg", 515, 261)))
  }

  test("JPEG with EOI before any SOF classifies as null") {
    assert(dims(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)) === None)
  }

  test("parses all three hand-built WebP container variants") {
    assert(dims(SyntheticImage.webpVp8(640, 360)) === Some(("webp", 640, 360)))
    assert(dims(SyntheticImage.webpVp8l(1, 1)) === Some(("webp", 1, 1)))
    assert(dims(SyntheticImage.webpVp8l(16383, 300)) === Some(("webp", 16383, 300)))
    assert(dims(SyntheticImage.webpVp8x(5000, 2999)) === Some(("webp", 5000, 2999)))
  }

  test("garbage, truncation, and zero dims classify as null") {
    assert(dims("not an image at all, just text".getBytes("UTF-8")) === None)
    assert(dims(Array.empty[Byte]) === None)
    val png = encode("png", 40, 30)
    assert(dims(png.take(20)) === None) // truncated before IHDR dims
    // valid PNG signature but a zeroed IHDR width
    val zeroW = png.clone(); zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(dims(zeroW) === None)
  }

  test("synthesize→decode end to end in one whole-stage codegen pass") {
    val df = spark.range(0, 200)
      .select(col("id"), SyntheticImage.syntheticImage(col("id")).as("content"))
      .select(col("id"), ImageMeta.imageMeta(col("content")).as("m"))
    val codegenned = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty, df.queryExecution.executedPlan.toString)
    val bad = df.filter(
      when(col("id") % 7 === 0, col("m").isNotNull) // garbage must be null
        .otherwise(col("m").isNull ||
          col("m.width") =!= (lit(8) + col("id") * 37 % 120).cast("int") ||
          col("m.height") =!= (lit(8) + col("id") * 53 % 120).cast("int") ||
          col("m.format") =!= when(col("id") % 5 === 0, "png")
            .when(col("id") % 5 === 1, "jpeg").otherwise("webp")))
    assert(bad.count() === 0)
  }

  test("SyntheticImage is deterministic and its PNG/JPEG are decodable") {
    for (id <- Seq(5L, 16L, 30L)) { // 5→png, 16→jpeg, 30→png
      val a = SyntheticImage.make(id)
      assert(java.util.Arrays.equals(a, SyntheticImage.make(id)))
      val img = ImageIO.read(new java.io.ByteArrayInputStream(a))
      assert(img != null)
      assert(img.getWidth === SyntheticImage.width(id))
      assert(img.getHeight === SyntheticImage.height(id))
    }
  }
}
