package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.EnvelopeGen
import graft.lake.LakeTable

/** Streaming CDC sink: `envelopes.writeStream.format("graft-lake")`
  * runs the full decode → LWW apply → idempotent MERGE pipeline per
  * micro-batch, table auto-created from the declared Arc schema. */
class LakeStreamSinkSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val arcJson =
    """[
      |{"name":"conv_id","type":"string","nullable":false},
      |{"name":"turn_idx","type":"integer","nullable":false},
      |{"name":"role","type":"string","nullable":false},
      |{"name":"text","type":"string","nullable":false},
      |{"name":"tool","type":"string","nullable":true},
      |{"name":"ts","type":"timestamp","nullable":false}
      |]""".stripMargin

  private def rawRows(wl: EnvelopeGen.Workload): Seq[EnvelopeGen.RawEnvelope] =
    wl.ops.zipWithIndex.map { case (op, i) =>
      val (k, v) = EnvelopeGen.relationalEnvelope(op, "mysql", 1700000000000L + i)
      EnvelopeGen.RawEnvelope(k.getBytes("UTF-8"), v.getBytes("UTF-8"),
        "cdc.transcripts", i % 4, i.toLong, new java.sql.Timestamp(1700000000000L + i), 0)
    }

  private def stateSet(t: LakeTable) =
    t.read().select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  private def oracleSet(wl: EnvelopeGen.Workload) =
    wl.finalState.values.map(x => (x.convId, x.turnIdx, x.text)).toSet

  test("writeStream format graft-lake reaches oracle parity; restart replays as no-op") {
    val wl = EnvelopeGen.workload(seed = 31, nConvs = 20, maxTurns = 4, nTxns = 300)
    val root = Scratch.dir("lake-sink")
    val ckpt = Scratch.dir("lake-sink-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EnvelopeGen.RawEnvelope]
    def start() = mem.toDF().writeStream.format("graft-lake")
      .option("path", root)
      .option("schemaJson", arcJson)
      .option("keys", "conv_id,turn_idx")
      .option("connector", "mysql")
      .option("strict", "false")
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    val rows = rawRows(wl)
    rows.grouped(100).foreach { g => mem.addData(g); q.processAllAvailable() }
    q.stop()
    val t = new LakeTable(spark, root)
    assert(stateSet(t) == oracleSet(wl))
    val v = t.currentVersion
    // restart from the same checkpoint: nothing new arrives, and the
    // engine's replay of any in-flight batch commits as a no-op
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(t.currentVersion == v)
    assert(stateSet(t) == oracleSet(wl))
  }

  test("merge-on-read sink variant reaches the same state") {
    val wl = EnvelopeGen.workload(seed = 32, nConvs = 15, maxTurns = 4, nTxns = 200)
    val root = Scratch.dir("lake-sink-mor")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EnvelopeGen.RawEnvelope]
    val q = mem.toDF().writeStream.format("graft-lake")
      .option("path", root)
      .option("schemaJson", arcJson)
      .option("keys", "conv_id,turn_idx")
      .option("connector", "mysql")
      .option("strict", "false")
      .option("mergeOnRead", "true")
      .option("autoCompact", "3")
      .option("checkpointLocation", Scratch.dir("lake-sink-mor-ckpt"))
      .start()
    val rows = rawRows(wl)
    rows.grouped(60).foreach { g => mem.addData(g); q.processAllAvailable() }
    q.stop()
    assert(stateSet(new LakeTable(spark, root)) == oracleSet(wl))
  }

  test("missing required sink options error clearly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EnvelopeGen.RawEnvelope]
    val e = intercept[Exception] {
      mem.toDF().writeStream.format("graft-lake")
        .option("path", Scratch.dir("lake-sink-bad"))
        .option("checkpointLocation", Scratch.dir("lake-sink-bad-ckpt"))
        .start()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("schemaJson")))
  }
}
