package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHashMin

class FunctionsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("rolling-hash fingerprint matches a direct reference computation") {
    def reference(s: String, n: Int): Long = {
      val b = s.getBytes("UTF-8")
      if (b.length < n) Long.MaxValue
      else (0 to b.length - n).map { i =>
        b.slice(i, i + n).foldLeft(0L)((h, x) => h * 1000003L + (x & 0xFF))
      }.min
    }
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "short", "", "aaaaaaaaaaaaaaaaaaaaaa", "ümlaut café 漢字 mixed")
    val got = texts.toDF("t")
      .select(RollingHashMin.rollingHashMin(col("t"), 8))
      .collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(reference(_, 8)))
  }

  test("identical windows collide; disjoint content does not (generically)") {
    val df = Seq(
      "prefix SHARED-WINDOW-CONTENT suffix one",
      "other text SHARED-WINDOW-CONTENT different tail",
      "completely unrelated words with nothing common").toDF("t")
      .select(RollingHashMin.rollingHashMin(col("t"), 12).as("h"))
    val hs = df.collect().map(_.getLong(0))
    // min-hash of shared window only collides if the shared window IS the
    // min for both — guaranteed here by making the shared part minimal
    assert(hs(0) != hs(2) && hs(1) != hs(2))
  }

  test("LastByOffset plans as ObjectHashAggregate, not SortAggregate") {
    val df = spark.range(1000)
      .select(col("id"), pmod(col("id"), lit(10)).as("k"),
        concat(lit("v"), col("id")).as("v"))
      .groupBy("k")
      .agg(graft.functions.LastByOffset.lastByOffset(
        struct(col("v"), col("id")), col("id")).as("w"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan was:\n$plan")
    assert(!plan.contains("SortAggregate"), s"plan was:\n$plan")
    val rows = df.select(col("k"), col("w.v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(0L) == "v990" && rows(9L) == "v999")
  }
}
