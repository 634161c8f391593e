package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKByScore
import graft.lake.LakeTable

/** Pins the optimizations that replaced plan shapes without changing
  * results: the bounded top-k aggregate (vs the window formulation it
  * replaced) and the packed write-routing preimages. */
class TopKByScoreSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def windowReference(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def topKAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("query_id"))
      .agg(TopKByScore.topKByScore(col("sim"), col("neighbor_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("_pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("topKByScore matches the row_number window formulation, ties and duplicates included") {
    val rnd = new scala.util.Random(7)
    // duplicate (q, n) pairs ALWAYS carry the same score (the ANN
    // contract: same two vectors) and score ties across neighbors occur
    val base = (0 until 40).flatMap { q =>
      (0 until 25).map { n =>
        (q.toLong, (n % 17).toLong, math.rint(rnd.nextDouble() * 8) / 8.0)
      }
    }.distinct
    val pairs = base.groupBy { case (q, n, _) => (q, n) }.map(_._2.head).toSeq
    val dupd = pairs ++ pairs.filter(_ => rnd.nextBoolean()) // duplicates
    for (k <- Seq(1, 3, 7)) {
      val df = dupd.toDF("query_id", "neighbor_id", "sim").repartition(7)
      assert(topKAgg(df, k) == windowReference(pairs.toDF("query_id", "neighbor_id", "sim"), k),
        s"k=$k mismatch")
    }
  }

  test("topKByScore survives partial/final merge across many partitions") {
    val rows = (0 until 2000).map(i => (i.toLong % 5, i.toLong, (i * 37 % 101).toDouble))
    val df = rows.toDF("query_id", "neighbor_id", "sim").repartition(32)
    assert(topKAgg(df, 4) == windowReference(rows.toDF("query_id", "neighbor_id", "sim"), 4))
  }

  test("partitionPreimages covers every partition exactly once") {
    for (n <- Seq(1, 2, 7, 32, 64, 333)) {
      val inv = LakeTable.partitionPreimages(n)
      assert(inv.length == n)
      val landed = inv.map { v =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        ((h % n) + n) % n
      }
      assert(landed.toSeq == (0 until n), s"n=$n: preimages don't map 1:1")
    }
  }

  test("packed write routing places each (bucket, salt) slot in its own shuffle partition") {
    // end-to-end: an append on a 4-bucket table with 32 shuffle
    // partitions (fpb=8) must produce ≥ 2 files for a bucket whose keys
    // span several salts, and the table must read back exactly
    val dir = graft.Scratch.dir("topk-pack-spec").toString
    val t = new LakeTable(spark, dir)
    val df = (0L until 4000L).map(i => (i, s"v$i")).toDF("id", "v")
    t.create(df.schema, Seq("id"), nBuckets = 4)
    t.append(df, "a", 0L)
    val back = t.read().select("id", "v").as[(Long, String)].collect().toSet
    assert(back == (0L until 4000L).map(i => (i, s"v$i")).toSet)
    // exact packing: with 4000 keys every (bucket, salt) slot is non-empty
    // whp, so the commit writes exactly nBuckets × filesPerBucket files
    val fpb = math.max(1, spark.sessionState.conf.numShufflePartitions / 4)
    val perBucket = t.currentSnapshot.get.files.groupBy(_.bucket).map(_._2.size)
    assert(perBucket.size == 4 && perBucket.forall(_ == fpb),
      s"expected $fpb files per bucket, got ${perBucket.toSeq}")
  }
}
