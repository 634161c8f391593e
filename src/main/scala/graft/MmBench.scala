package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Same-JVM A/B for the multimodal resize kernel: the per-partition
  * ImageKernel (reused per-format readers + one PNG writer — the
  * production `MultimodalOps.resizeImage`) vs the naive per-row
  * `ImageIO.read`/`ImageIO.write` (SPI sniff + codec instantiation on
  * EVERY call). Same synthesized input parquet, alternating A/B/A/B
  * draws in one JVM, noop sink. Prints one JSON line.
  *
  * Env: SPARK_GRAFT_BENCH_IMAGES (default 20000), SPARK_GRAFT_CPUS (8). */
object MmBench {

  /** The pre-round-4 resize: generic ImageIO per row, both directions. */
  private def resizeNaive(df: DataFrame, contentCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("resized", BinaryType))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val img =
          if (bytes == null) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
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
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          bos.toByteArray
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val nImages = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rawPath = Scratch.dir("mm-bench").toString + "/assets"
    spark.range(nImages).select(col("id").as("doc_id"),
        graft.functions.SyntheticImage.syntheticImage(col("id")).as("content"))
      .write.parquet(rawPath)
    val assets = spark.read.parquet(rawPath)

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm: page cache + JIT + codegen, both paths, untimed
    sink(operators.MultimodalOps.resizeImage(assets, "content", 16, 12))
    sink(resizeNaive(assets, "content", 16, 12))

    // alternating draws so neither path benefits from JVM ramp-up order
    val draws = Seq(
      "kernel" -> (() => sink(operators.MultimodalOps.resizeImage(assets, "content", 16, 12))),
      "naive" -> (() => sink(resizeNaive(assets, "content", 16, 12))),
      "kernel" -> (() => sink(operators.MultimodalOps.resizeImage(assets, "content", 16, 12))),
      "naive" -> (() => sink(resizeNaive(assets, "content", 16, 12))))
      .map { case (k, f) => k -> time(f()) }
    val best = draws.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val qs = draws.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("[", ",", "]")
    println(f"""{"metric":"mm_resize_ab","unit":"sec","images":$nImages,"draws":$qs,"bestKernel":${best("kernel")}%.2f,"bestNaive":${best("naive")}%.2f,"speedup":${best("naive") / best("kernel")}%.2f}""")
    spark.stop()
  }
}
