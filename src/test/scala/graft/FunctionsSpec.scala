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

  test("LastByOffset breaks duplicate-offset ties deterministically under repartitioning") {
    // 6 rows per key share ONE offset; whatever payload wins must win under
    // every partitioning and input order
    val payloads = Seq("zeta", "alpha", "omega", "beta", "kappa", "mu")
    def winners(shuffleSeed: Int, parts: Int): Map[Long, String] = {
      val rows = new scala.util.Random(shuffleSeed).shuffle(
        for (k <- 0L until 5L; v <- payloads) yield (k, 10L, s"$v-$k"))
      rows.toDF("k", "off", "v").repartition(parts)
        .groupBy("k")
        .agg(graft.functions.LastByOffset.lastByOffset(
          struct(col("v")), col("off")).as("w"))
        .select(col("k"), col("w.v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val ref = winners(1, 1)
    assert(winners(2, 7) == ref)
    assert(winners(3, 32) == ref)
  }

  test("PatchFoldBySeq folds seq ties in a deterministic order") {
    // two FULL rows share seq=5 for the same key (un-reduced append of
    // duplicate keys in one commit): the reconstruction winner must not
    // depend on partitioning or arrival order
    val payloads = Seq("aa", "zz", "mm", "qq")
    def winners(shuffleSeed: Int, parts: Int): Map[Long, String] = {
      val rows = new scala.util.Random(shuffleSeed).shuffle(
        for (k <- 0L until 4L; v <- payloads)
          yield (k, s"$v-$k", "r", null.asInstanceOf[Seq[String]], 5L))
      rows.toDF("k", "text", "operation", "_patch_mask", "seq")
        .repartition(parts)
        .groupBy("k")
        .agg(graft.functions.PatchFoldBySeq.patchFoldBySeq(
          struct(col("text"), col("operation"), col("_patch_mask")),
          col("seq")).as("w"))
        .select(col("k"), col("w.text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val ref = winners(1, 1)
    assert(winners(2, 5) == ref)
    assert(winners(3, 32) == ref)
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
