package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps

/** Custom streaming state (mapGroupsWithState / flatMapGroupsWithState):
  * state must survive micro-batch boundaries and agree with the batch
  * formulation of the same computation. */
class StatefulStreamSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._
  implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def sinkName() =
    "sink_" + java.util.UUID.randomUUID().toString.replace("-", "")

  test("streamingFirstByKey drops duplicates ACROSS micro-batches") {
    val mem = MemoryStream[(Long, String)]
    val name = sinkName()
    val q = StatefulOps.streamingFirstByKey(
        mem.toDF().toDF("id", "payload"), Seq("id"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    mem.addData(Seq((1L, "a"), (2L, "b"), (1L, "a")))
    q.processAllAvailable()
    mem.addData(Seq((1L, "a"), (3L, "c"), (2L, "b")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("runningCountByKey folds counts across three micro-batches (Update mode)") {
    val mem = MemoryStream[(Long, String)]
    val name = sinkName()
    val q = StatefulOps.runningCountByKey(
        mem.toDF().toDF("id", "payload"), Seq("id"))
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    val batches = Seq(
      Seq((1L, "x"), (1L, "y"), (2L, "x")),
      Seq((2L, "z"), (3L, "x")),
      Seq((1L, "z"), (3L, "y"), (3L, "z")))
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    // Update mode re-emits on every change: the LAST emission per key is
    // the final running count and must equal the batch groupBy
    val last = spark.table(name).groupBy(col("key"))
      .agg(max(col("n")).as("n"))
      .as[(String, Long)].collect().toMap
    // the composite state key is the JSON-encoded key tuple (injective)
    assert(last == Map("{\"id\":1}" -> 3L, "{\"id\":2}" -> 2L, "{\"id\":3}" -> 3L))
  }

  test("composite state key is injective: '|' in values and nulls don't collide") {
    // a delimiter-concat key would collide ("a|b","c") with ("a","b|c")
    // and (null,"x") with ("x",null) — each of the four tuples below must
    // keep its own state slot and survive first-by-key dedup intact
    val df = Seq(
      (Some("a|b"), Some("c")), (Some("a"), Some("b|c")),
      (None: Option[String], Some("x")), (Some("x"), None: Option[String])
    ).toDF("k1", "k2")
    val got = StatefulOps.streamingFirstByKey(df, Seq("k1", "k2"))
      .as[(Option[String], Option[String])].collect().toSet
    assert(got == Set(
      (Some("a|b"), Some("c")), (Some("a"), Some("b|c")),
      (None, Some("x")), (Some("x"), None)))
  }

  test("streamingFirstByKey has an identical batch-mode plan semantics") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "payload")
    val got = StatefulOps.streamingFirstByKey(df, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
