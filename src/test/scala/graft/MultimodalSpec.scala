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

  test("sampleFrames explodes every Nth chunk with frame indices") {
    val df = MultimodalOps.sampleFrames(assets(5), "content", everyN = 2)
    assert(df.count() > 5)
    assert(df.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() == 0)
    assert(df.filter(length(col("frame")) === 0).count() == 0)
  }
}
