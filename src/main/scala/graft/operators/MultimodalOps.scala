package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / resize / frame-sample / feature-extraction run as
  * partition-batched typed transforms (the Scala analog of `mapInPandas`
  * batching: one iterator per partition, rows streamed through).
  *
  * The IMAGE path is real: `graft.functions.ImageMeta` parses actual
  * PNG/JPEG/WebP headers with pure byte logic inside whole-stage codegen,
  * and `decodeImage` / `resizeImage` run the JDK's own codecs
  * (`javax.imageio`, PNG/JPEG/GIF/BMP) as partition-batched kernels,
  * falling back to header-only metadata for container formats the JDK
  * can't rasterize (WebP) and classifying garbage as null. The AUDIO
  * path is real: `graft.functions.AudioMeta` parses RIFF/WAVE headers
  * in codegen and `decodeAudio` streams PCM frames through the JDK's
  * WAV codec (`javax.sound.sampled`) for exact sample statistics. The
  * VIDEO path is real for AVI/MJPEG: `graft.functions.VideoMeta` parses
  * the AVI main header in codegen, `demuxVideoFrames` walks the movi
  * list byte-by-byte, and each MJPEG frame rasterizes through the JDK
  * JPEG codec — zero external libraries end to end. (`decodeMeta` /
  * `extractFeatures` / `sampleFrames` over the GRFT synthetic header
  * remain as the generic-binary plumbing exercises.)
  */
object MultimodalOps {

  val Formats = Seq("png", "jpeg", "webp")

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Deterministic synthetic asset: 16-byte header
    * [magic(4) | formatIdx(4) | width(4) | height(4)] + pseudo-random body
    * derived from the id — a stand-in for a real encoded image. */
  def syntheticAsset(id: Column, bodyLen: Column): Column = {
    val fmtIdx = pmod(id, lit(Formats.size)).cast("int")
    val w = (lit(64) + pmod(id * 37, lit(960))).cast("int")
    val h = (lit(64) + pmod(id * 53, lit(960))).cast("int")
    concat(
      lit(Array[Byte](0x47, 0x52, 0x46, 0x54)), // "GRFT"
      int32be(fmtIdx), int32be(w), int32be(h),
      // body: repeated hash bytes, truncated to bodyLen
      substr(repeat(sha2(id.cast("string"), 256), 40).cast("binary"), lit(1), bodyLen))
  }

  private def int32be(v: Column): Column =
    concat(
      chrByte(shiftright(v, 24)), chrByte(shiftright(v, 16)),
      chrByte(shiftright(v, 8)), chrByte(v))
  private def chrByte(v: Column): Column =
    // single byte binary from the low 8 bits
    substr(unhex(lpad(hex(v.bitwiseAND(255)), 2, "0")), lit(1), lit(1))

  /** STUB "decode": parse the synthetic header into the typed metadata
    * struct — pure expressions, no UDF. A real decoder would replace the
    * header parse with a codec call inside `mapPartitionsBatched`. */
  def decodeMeta(content: Column): Column = {
    def beInt(off: Int): Column =
      (conv(hex(substr(content, lit(off), lit(4))), 16, 10)).cast("long").cast("int")
    struct(
      element_at(array(Formats.map(lit): _*), (beInt(5) % Formats.size) + 1).as("format"),
      beInt(9).as("width"),
      beInt(13).as("height"),
      length(content).cast("int").as("n_bytes"))
  }

  /** REAL partition-batched image decode: `javax.imageio` rasterizes
    * PNG/JPEG/GIF/BMP content and the kernel emits per-channel mean
    * intensities plus the decoded dimensions; formats the JDK can't
    * rasterize but `ImageMeta` recognizes (WebP) get header-only
    * metadata with null pixel stats; unrecognized bytes get all nulls.
    * One codec call per row inside a partition iterator — the Scala
    * analog of a `mapInPandas` decode stage, and the pattern any
    * heavier codec (audio/video) would slot into.
    *
    * Scale note: the kernel is embarrassingly parallel and allocation-
    * bounded per row (one BufferedImage of the decoded size); at 100 TB
    * the knob is input split size, not this operator's shape. */
  def decodeImage(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      val kernel = new ImageKernel // codec instances amortized per task
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq ++ kernel.decodeOne(bytes))
      }
    }
  }

  /** Per-partition image decode kernel: `ImageIO.read` performs format
    * sniffing + reader instantiation on EVERY call; a real batch kernel
    * creates the codec once per partition and reuses it (the mapInPandas
    * "init once per batch" pattern — measured ~2× on per-frame MJPEG
    * decode). Single-threaded per Spark task, so reader reuse is safe. */
  private final class ImageKernel {
    private val readers =
      scala.collection.mutable.HashMap.empty[String, javax.imageio.ImageReader]

    private def readVia(fmt: String, bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val r = readers.getOrElseUpdate(fmt,
        javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try { r.setInput(iis, true, true); r.read(0) }
      catch { case _: Exception => null }
      finally iis.close()
    }

    /** The one codec-dispatch policy: reuse the per-format reader for
      * formats the JDK rasterizes, never SPI-sniff recognized WebP (no
      * JDK rasterizer — the sniff is doomed), generic fallback for
      * unrecognized content (BMP/GIF/…). */
    private def rasterizeFmt(fmt: String, bytes: Array[Byte]): java.awt.image.BufferedImage =
      fmt match {
        case "png" | "jpeg" | "gif" | "bmp" => readVia(fmt, bytes)
        case "webp" => null
        case _ => readImage(bytes)
      }

    /** Decoded pixels; null when the content can't rasterize. */
    def rasterize(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null) return null
      val meta = graft.functions.ImageMeta.parse(bytes)
      rasterizeFmt(if (meta == null) null else meta.getUTF8String(0).toString, bytes)
    }

    // one PNG encoder per task, same rationale as the per-format readers:
    // ImageIO.write SPI-sniffs + instantiates a writer on every call
    private lazy val pngWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

    /** Lossless PNG encode through the reused per-partition writer. */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { pngWriter.setOutput(ios); pngWriter.write(img) } finally ios.close()
      bos.toByteArray
    }

    /** format, width, height, mean_r, mean_g, mean_b for one payload. */
    def decodeOne(bytes: Array[Byte]): Seq[Any] = {
      if (bytes == null) return Seq(null, null, null, null, null, null)
      val meta = graft.functions.ImageMeta.parse(bytes)
      val fmt = if (meta == null) null else meta.getUTF8String(0).toString
      val img = rasterizeFmt(fmt, bytes)
      if (img != null) {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var r = 0L; var g = 0L; var b = 0L; var i = 0
        while (i < px.length) {
          val p = px(i)
          r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
          i += 1
        }
        val n = px.length.toDouble
        Seq(if (fmt == null) "unknown" else fmt, w, h, r / n, g / n, b / n)
      } else if (meta != null) {
        // recognized container, no JDK rasterizer (WebP): header-only
        Seq(fmt, meta.getInt(1), meta.getInt(2), null, null, null)
      } else Seq(null, null, null, null, null, null)
    }
  }

  // executors construct kernels lazily — make sure ImageIO's disk cache
  // is off on every JVM that rasterizes (temp file per call otherwise)
  javax.imageio.ImageIO.setUseCache(false)

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null } // malformed content classifies, never throws

  /** REAL resize for JDK-decodable content: decode → nearest-neighbor
    * rescale → re-encode as PNG (lossless, so downstream stats stay
    * oracle-predictable). Undecodable content maps to null — resize is a
    * filter+transform, not a validator. Decode AND encode run through the
    * per-partition [[ImageKernel]] (reused per-format readers + one PNG
    * writer): `ImageIO.read`/`write` per row SPI-sniff and instantiate a
    * codec every call — measured ~2× on codec-bound rows. */
  def resizeImage(df: DataFrame, contentCol: String, w: Int, h: Int,
      outCol: String = "resized"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      val kernel = new ImageKernel
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val img = kernel.rasterize(bytes)
        val out: Any = if (img == null) null else {
          val scaled = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val sy = (y.toLong * img.getHeight / h).toInt
            var x = 0
            while (x < w) {
              scaled.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / w).toInt, sy))
              x += 1
            }
            y += 1
          }
          kernel.encodePng(scaled)
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** REAL partition-batched audio decode: the JDK's own WAV codec
    * (`javax.sound.sampled`) parses and streams the PCM frames; the
    * kernel emits format metadata plus exact sample statistics
    * (mean / RMS / peak amplitude) for 16-bit little-endian PCM, and
    * header-only metadata for PCM widths it doesn't sample-decode.
    * Unrecognized bytes classify as all-null. */
  def decodeAudio(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("format", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("mean_amp", DoubleType),
      StructField("rms_amp", DoubleType),
      StructField("peak_amp", IntegerType)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq ++ decodeAudioOne(row.getAs[Array[Byte]](idx)))
      }
    }
  }

  /** The JDK's registered audio readers, loaded ONCE per JVM:
    * `AudioSystem.getAudioFileFormat` / `getAudioInputStream` resolve
    * providers through `JDK13Services.getProviders`, which is a
    * `synchronized` global — N parallel decode tasks serialize on that
    * lock and run SLOWER than one task. Dispatching over the same SPI
    * instances directly is lock-free and sniffs identically (each
    * reader accepts only its own container format). */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.collection.JavaConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  private def decodeAudioOne(bytes: Array[Byte]): Seq[Any] = {
    if (bytes == null) return Seq.fill[Any](8)(null)
    val (fmtName, in) = {
      var name: String = null
      var stream: javax.sound.sampled.AudioInputStream = null
      val rs = audioReaders.iterator
      while (stream == null && rs.hasNext) {
        val r = rs.next()
        try {
          val bais = new java.io.ByteArrayInputStream(bytes)
          name = r.getAudioFileFormat(bais).getType.getExtension
          bais.reset()
          stream = r.getAudioInputStream(bais)
        } catch { case _: Exception => () } // not this reader's format
      }
      (name, stream) // all readers declined: non-audio classifies as null
    }
    if (in == null) return Seq.fill[Any](8)(null)
    val f = in.getFormat
    val meta = Seq[Any](fmtName, f.getChannels, f.getSampleRate.toInt,
      f.getSampleSizeInBits, in.getFrameLength)
    // 16-bit signed PCM in either byte order (WAV little, AIFF big)
    if (f.getSampleSizeInBits == 16 &&
        f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
      val pcm = in.readAllBytes()
      val n = pcm.length / 2
      var sum = 0L; var sumSq = 0L; var peak = 0; var i = 0
      while (i < n) {
        val v =
          if (f.isBigEndian) ((pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xFF)).toShort.toInt
          else ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toInt
        sum += v; sumSq += v.toLong * v
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      if (n == 0) meta ++ Seq(null, null, null)
      else meta ++ Seq[Any](sum.toDouble / n, math.sqrt(sumSq.toDouble / n), peak)
    } else meta ++ Seq(null, null, null)
  }

  /** REAL video demux: walks the RIFF/AVI `movi` list with pure byte
    * logic and explodes each `00dc`/`00db` video chunk into a row
    * (frame_idx, frame bytes) — for MJPEG those payloads are genuine
    * JPEGs, so `decodeImage` downstream rasterizes them with the JDK
    * codec. Non-AVI or frame-free content yields no rows (a demux is a
    * filter, not a validator). The 1→N explosion runs inside a
    * partition iterator via flatMap — no driver involvement, and the
    * output partitioning stays the input's. */
  def demuxVideoFrames(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        aviFrames(row.getAs[Array[Byte]](idx)).zipWithIndex.map {
          case (frame, i) => Row.fromSeq(row.toSeq ++ Seq(i, frame))
        }
      }
    }
  }

  /** The video-chunk payloads of an AVI's movi list; empty for non-AVI. */
  private def aviFrames(b: Array[Byte]): Seq[Array[Byte]] = {
    import graft.functions.VideoMeta.{is4, le32}
    if (b == null || b.length < 20 || !is4(b, 0, "RIFF") || !is4(b, 8, "AVI "))
      return Nil
    var p = 12
    while (p + 8 <= b.length) {
      val sz = le32(b, p + 4)
      if (sz < 0 || sz > Int.MaxValue) return Nil
      if (is4(b, p, "LIST") && is4(b, p + 8, "movi")) {
        val frames = Seq.newBuilder[Array[Byte]]
        var q = p + 12
        val end = math.min(b.length.toLong, p + 8 + sz).toInt
        while (q + 8 <= end) {
          val csz = le32(b, q + 4)
          if (csz < 0 || q + 8 + csz > end) return frames.result()
          if (is4(b, q, "00dc") || is4(b, q, "00db"))
            frames += java.util.Arrays.copyOfRange(b, q + 8, q + 8 + csz.toInt)
          val nextQ = q.toLong + 8L + csz + (csz & 1L)
          if (nextQ > end) q = end else q = nextQ.toInt
        }
        return frames.result()
      }
      // Long advance: a hostile size near 2^31 must not wrap the index
      val next = p.toLong + 8L + sz + (sz & 1L)
      if (next > b.length) p = b.length else p = next.toInt
    }
    Nil
  }

  /** REAL image embedding: decode the pixels (JDK codec) and emit a
    * grid×grid×RGB mean-intensity vector, L2-normalized — the classic
    * color-layout descriptor, ANN-able by VectorOps (cosine / RHP-LSH)
    * like any other `array<float>` column. Undecodable content → null
    * vector. Codec init amortized per partition (ImageKernel). */
  def imageFeatures(df: DataFrame, contentCol: String, grid: Int = 4,
      outCol: String = "features"): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      val kernel = new ImageKernel
      it.map { row =>
        val img = kernel.rasterize(row.getAs[Array[Byte]](idx))
        val out: Any = if (img == null) null else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val sums = new Array[Double](grid * grid * 3)
          val counts = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            val gy = y * grid / h
            var x = 0
            while (x < w) {
              val cell = gy * grid + (x * grid / w)
              val p = px(y * w + x)
              sums(cell * 3) += (p >> 16) & 0xFF
              sums(cell * 3 + 1) += (p >> 8) & 0xFF
              sums(cell * 3 + 2) += p & 0xFF
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          val v = new Array[Float](grid * grid * 3)
          var i = 0
          while (i < v.length) {
            val n = counts(i / 3)
            v(i) = if (n == 0) 0f else (sums(i) / n).toFloat
            i += 1
          }
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum) max 1e-12
          v.map(x => (x / norm).toFloat).toSeq
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  /** Partition-batched feature extraction (the mapInPandas analog):
    * binary content → fixed-width float embedding. STUB kernel: xxhash of
    * 64-byte chunks, folded into `dim` accumulators, L2-normalized —
    * deterministic, content-sensitive, no external libs. */
  def extractFeatures(df: DataFrame, contentCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val acc = new Array[Double](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            val end = math.min(i + 64, bytes.length)
            var h = 1125899906842597L // FNV-ish fold
            var j = i
            while (j < end) { h = 31 * h + bytes(j); j += 1 }
            acc(((h % dim) + dim).toInt % dim) += (h >>> 32).toDouble / (1L << 32).toDouble
            i = end
          }
        }
        val norm = math.sqrt(acc.map(x => x * x).sum) max 1e-12
        Row.fromSeq(row.toSeq :+ acc.map(x => (x / norm).toFloat).toSeq)
      }
    }
  }

  /** STUB resize: rewrites the header dims, keeps (truncated) body —
    * models a bytes→bytes kernel with metadata update. */
  def resizeStub(content: Column, w: Int, h: Int): Column =
    concat(substr(content, lit(1), lit(8)),
      int32be(lit(w)), int32be(lit(h)),
      substr(content, lit(17), greatest(length(content) - 16, lit(0))))

  /** STUB frame sampling for "video" assets: emit every `everyN`-th 64-byte
    * body chunk as a frame row (models 1→N explode with frame index). */
  def sampleFrames(df: DataFrame, contentCol: String, everyN: Int): DataFrame =
    df.withColumn("_n_chunks",
        greatest((length(col(contentCol)) - 16) / 64, lit(0)).cast("int"))
      .withColumn("frame_idx",
        explode(when(col("_n_chunks") > 0,
          sequence(lit(0), col("_n_chunks") - 1, lit(everyN)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        substr(col(contentCol), lit(17) + col("frame_idx") * 64, lit(64)))
      .drop("_n_chunks")
}
