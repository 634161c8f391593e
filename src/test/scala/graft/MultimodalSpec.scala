package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def assets(n: Int) =
    spark.range(n).select(col("id"),
      MultimodalOps.syntheticAsset(col("id"), lit(200) + pmod(col("id"), lit(100))).as("content"))

  test("decodeMeta round-trips the synthetic header") {
    val df = assets(50).select(col("id"), MultimodalOps.decodeMeta(col("content")).as("m"))
    val bad = df.filter(
      col("m.format") =!= element_at(
        array(MultimodalOps.Formats.map(lit): _*), (pmod(col("id"), lit(3)) + 1).cast("int")) ||
      col("m.width") =!= (lit(64) + pmod(col("id") * 37, lit(960))).cast("int") ||
      col("m.height") =!= (lit(64) + pmod(col("id") * 53, lit(960))).cast("int"))
    assert(bad.count() == 0)
  }

  test("extractFeatures yields normalized fixed-width embeddings") {
    val df = MultimodalOps.extractFeatures(assets(30), "content", dim = 16)
    val rows = df.select("features").collect()
    assert(rows.forall(_.getSeq[Float](0).length == 16))
    val norms = rows.map(r => math.sqrt(r.getSeq[Float](0).map(x => x * x.toDouble).sum))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
    // deterministic: same input → same features
    val again = MultimodalOps.extractFeatures(assets(30), "content", dim = 16)
      .select("features").collect()
    assert(rows.map(_.getSeq[Float](0)).toSeq == again.map(_.getSeq[Float](0)).toSeq)
  }

  test("resizeStub rewrites dims, preserves format") {
    val df = assets(10).select(col("id"),
      MultimodalOps.decodeMeta(MultimodalOps.resizeStub(col("content"), 32, 24)).as("m"))
    assert(df.filter(col("m.width") =!= 32 || col("m.height") =!= 24).count() == 0)
    assert(df.filter(col("m.format").isNull).count() == 0)
  }

  test("decodeImage: real pixel decode — PNG exact, JPEG approximate, WebP header-only, garbage null") {
    import graft.functions.SyntheticImage
    val df = MultimodalOps.decodeImage(
      spark.range(0, 120).select(col("id"),
        SyntheticImage.syntheticImage(col("id")).as("content")), "content")
    val rows = df.select("id", "format", "width", "height", "mean_r", "mean_g", "mean_b")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 120L) {
      val r = rows(id)
      if (SyntheticImage.isGarbage(id)) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(4), s"id=$id")
      } else {
        assert(r.getInt(2) === SyntheticImage.width(id), s"id=$id")
        assert(r.getInt(3) === SyntheticImage.height(id), s"id=$id")
        val c = SyntheticImage.rgb(id)
        id % 5 match {
          case 0 => // PNG: lossless, solid-fill means are exact
            assert(r.getString(1) === "png")
            assert(r.getDouble(4) === ((c >> 16) & 0xFF).toDouble, s"id=$id")
            assert(r.getDouble(5) === ((c >> 8) & 0xFF).toDouble, s"id=$id")
            assert(r.getDouble(6) === (c & 0xFF).toDouble, s"id=$id")
          case 1 => // JPEG: real decode, lossy — tight tolerance on a solid fill
            assert(r.getString(1) === "jpeg")
            assert(math.abs(r.getDouble(4) - ((c >> 16) & 0xFF)) < 4.0, s"id=$id")
            assert(math.abs(r.getDouble(5) - ((c >> 8) & 0xFF)) < 4.0, s"id=$id")
            assert(math.abs(r.getDouble(6) - (c & 0xFF)) < 4.0, s"id=$id")
          case _ => // WebP: header-only fallback, no JDK rasterizer
            assert(r.getString(1) === "webp")
            assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6), s"id=$id")
        }
      }
    }
  }

  test("resizeImage: real decode→rescale→PNG re-encode preserves solid fill") {
    import graft.functions.SyntheticImage
    val src = spark.range(0, 60).select(col("id"),
      SyntheticImage.syntheticImage(col("id")).as("content"))
    val resized = MultimodalOps.decodeImage(
      MultimodalOps.resizeImage(src, "content", 16, 12).drop("content"), "resized")
    val rows = resized.select("id", "format", "width", "height", "mean_r")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 60L) {
      val r = rows(id)
      if (SyntheticImage.isGarbage(id) || id % 5 >= 2) {
        assert(r.isNullAt(1), s"id=$id: undecodable input must resize to null")
      } else {
        assert(r.getString(1) === "png" && r.getInt(2) === 16 && r.getInt(3) === 12, s"id=$id")
        if (id % 5 == 0) // PNG in, PNG out: solid fill survives exactly
          assert(r.getDouble(4) === ((SyntheticImage.rgb(id) >> 16) & 0xFF).toDouble, s"id=$id")
      }
    }
  }

  test("imageFeatures: real pixel embedding — exact for solid PNG, ANN-compatible") {
    import graft.functions.SyntheticImage
    import graft.operators.VectorOps
    val df = MultimodalOps.imageFeatures(
      spark.range(0, 60).select(col("id"),
        SyntheticImage.syntheticImage(col("id")).as("content")), "content", grid = 2)
    val rows = df.select("id", "features").collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    for (id <- 0L until 60L) {
      val f = rows(id)
      if (SyntheticImage.isGarbage(id) || id % 5 >= 2) assert(f == null, s"id=$id")
      else {
        assert(f.length === 12, s"id=$id") // 2×2 cells × RGB
        val c = SyntheticImage.rgb(id)
        val rgb = Array((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF).map(_.toDouble)
        val norm = math.sqrt(rgb.map(x => x * x).sum * 4) max 1e-12
        if (id % 5 == 0) // PNG lossless: every cell mean is the exact fill
          f.zipWithIndex.foreach { case (v, i) =>
            assert(math.abs(v - rgb(i % 3) / norm) < 1e-6, s"id=$id i=$i") }
        val n2 = math.sqrt(f.map(x => x.toDouble * x).sum)
        assert(math.abs(n2 - 1.0) < 1e-4, s"id=$id unit norm")
      }
    }
    // the embedding column feeds the ANN operator like any other
    val emb = df.filter(col("features").isNotNull)
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val topk = VectorOps.cosineTopK(emb, "vec_id", "embedding",
      emb.limit(3), "vec_id", "embedding", 2)
    assert(topk.count() === 6)
  }

  test("sampleFrames explodes every Nth chunk with frame indices") {
    val df = MultimodalOps.sampleFrames(assets(5), "content", everyN = 2)
    assert(df.count() > 5)
    assert(df.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() == 0)
    assert(df.filter(length(col("frame")) === 0).count() == 0)
  }
}
