package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Streaming CDF source: readStream.format("graft-lake") tails the
  * change feed with the table version as the checkpointed offset. */
class LakeStreamSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  private def rows(lo: Long, hi: Long, tag: String = "a"): DataFrame =
    spark.range(lo, hi).select(col("id"),
      concat(lit(s"$tag-"), col("id").cast("string")).as("name"))

  private def deltas(df: DataFrame, op: String): DataFrame =
    df.withColumn("operation", lit(op)).withColumn("offset", col("id"))

  test("bootstrap, incremental micro-batches, restart from checkpoint") {
    val t = new LakeTable(spark, Scratch.dir("cdf-src"))
    t.create(schema, Seq("id"), nBuckets = 4)
    t.append(rows(0, 100), "c0", 0L)
    val ckpt = Scratch.dir("cdf-src-ckpt")
    val seen = mutable.Buffer.empty[(Long, Map[String, Int], Set[Long])]
    def start() = spark.readStream.format("graft-lake").load(t.root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val rs = df.collect()
        seen += ((id,
          rs.groupBy(_.getAs[String]("_change_type")).map { case (k, v) => k -> v.length },
          rs.map(_.getLong(0)).toSet))
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    assert(seen.size == 1)
    assert(seen(0)._2 == Map("insert" -> 100)) // bootstrap

    t.merge(deltas(rows(0, 5, "b"), "u").unionByName(deltas(rows(95, 100), "d")), "c1", 1L)
    q.processAllAvailable()
    assert(seen.size == 2)
    assert(seen(1)._2 == Map("update" -> 5, "delete" -> 5))
    assert(seen(1)._3 == ((0L until 5L) ++ (95L until 100L)).toSet)
    q.stop()

    // commits while the stream is down; restart resumes at the
    // checkpointed version — no re-bootstrap, only the missed interval
    t.merge(deltas(rows(100, 103), "c"), "c2", 2L)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.size == 3)
    assert(seen(2)._2 == Map("insert" -> 3))
    assert(seen(2)._3 == Set(100L, 101L, 102L))
  }

  test("startingVersion skips the bootstrap") {
    val t = new LakeTable(spark, Scratch.dir("cdf-src-sv"))
    t.create(schema, Seq("id"), nBuckets = 4)
    t.append(rows(0, 50), "c0", 0L)
    val v1 = t.currentVersion.get
    t.merge(deltas(rows(0, 2, "z"), "u"), "c1", 1L)
    val seen = mutable.Buffer.empty[Map[String, Int]]
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", v1.toString).load(t.root)
      .writeStream.option("checkpointLocation", Scratch.dir("cdf-sv-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen += df.collect()
          .groupBy(_.getAs[String]("_change_type")).map { case (k, v) => k -> v.length }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(seen.size == 1)
    assert(seen(0) == Map("update" -> 2)) // only the post-v1 interval
  }

  test("maxVersionsPerBatch rate-limits catch-up to one commit interval per micro-batch") {
    val t = new LakeTable(spark, Scratch.dir("cdf-src-rate"))
    t.create(schema, Seq("id"), nBuckets = 4)
    t.append(rows(0, 10), "c0", 0L)
    val v1 = t.currentVersion.get
    // three more commits BEFORE the stream starts — an uncapped stream
    // would fold them into one catch-up batch
    t.merge(deltas(rows(10, 12), "c"), "c1", 1L)
    t.merge(deltas(rows(12, 14), "c"), "c2", 2L)
    t.merge(deltas(rows(14, 16), "c"), "c3", 3L)
    val seen = mutable.Buffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-lake")
      .option("startingVersion", v1.toString)
      .option("maxVersionsPerBatch", "1")
      .load(t.root)
      .writeStream.option("checkpointLocation", Scratch.dir("cdf-rate-ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen += df.collect().map(_.getLong(0)).toSet
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // one micro-batch per commit interval, in order
    assert(seen.toSeq == Seq(Set(10L, 11L), Set(12L, 13L), Set(14L, 15L)))
  }
}
