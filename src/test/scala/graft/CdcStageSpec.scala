package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.EnvelopeGen
import graft.model.{ArcSchemaParser, CdcSchema}
import graft.streaming.MetricsStream

/** The reference-shaped stage API: inputView → CdcStage.execute →
  * outputView, including initial-state chaining across three batches
  * (mirror of the reference Batch tests,
  * MySQLDebeziumTransformSuite.scala:571-785). */
class CdcStageSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val schema = CdcSchema.transcripts

  private def oracleSet(wl: EnvelopeGen.Workload) =
    wl.finalState.values.map(t => (t.convId, t.turnIdx, t.text)).toSet

  private def viewSet(view: String) =
    spark.table(view).select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  test("stage executes end-to-end and registers the output view") {
    val wl = EnvelopeGen.workload(seed = 40, nConvs = 15, maxTurns = 4, nTxns = 150)
    EnvelopeGen.toDataFrame(spark, wl).createOrReplaceTempView("stage_in")
    val out = CdcStage.execute(CdcStageConfig(
      name = "t", inputView = "stage_in", outputView = "stage_out",
      schema = Some(schema), strict = true, numPartitions = Some(3)))(spark)
    assert(viewSet("stage_out") == oracleSet(wl))
    assert(out.rdd.getNumPartitions == 3)
  }

  test("three chained batches via initialStateView reach source parity") {
    val wl = EnvelopeGen.workload(seed = 41, nConvs = 20, maxTurns = 4, nTxns = 300)
    val all = EnvelopeGen.toDataFrame(spark, wl)
    val n = wl.ops.length
    val cuts = Seq(0L, n / 3L, 2L * n / 3, n.toLong)
    var prevView: Option[String] = None
    for (b <- 0 until 3) {
      val batch = all.filter(col("offset") >= cuts(b) && col("offset") < cuts(b + 1))
        // chained batches replay against state at offset 0: shift offsets +1
        .withColumn("offset", col("offset") + 1)
      batch.createOrReplaceTempView(s"stage_b$b")
      CdcStage.execute(CdcStageConfig(
        name = s"b$b", inputView = s"stage_b$b", outputView = s"stage_o$b",
        schema = Some(schema), strict = true,
        initialStateView = prevView,
        initialStateKey = prevView.map(_ => "conv_id,turn_idx")))(spark)
      prevView = Some(s"stage_o$b")
    }
    assert(viewSet(prevView.get) == oracleSet(wl))
  }

  test("initialStateKey must match the declared key columns") {
    val wl = EnvelopeGen.workload(seed = 45, nConvs = 5, maxTurns = 3, nTxns = 30)
    EnvelopeGen.toDataFrame(spark, wl).createOrReplaceTempView("stage_isk_in")
    CdcStage.execute(CdcStageConfig(
      name = "s0", inputView = "stage_isk_in", outputView = "stage_isk_state",
      schema = Some(schema), strict = true))(spark)
    val e = intercept[IllegalArgumentException] {
      CdcStage.execute(CdcStageConfig(
        name = "s1", inputView = "stage_isk_in", outputView = "stage_isk_out",
        schema = Some(schema), strict = true,
        initialStateView = Some("stage_isk_state"),
        initialStateKey = Some("wrong_col")))(spark)
    }
    assert(e.getMessage.contains("initialStateKey"))
    // the matching composite key passes
    CdcStage.execute(CdcStageConfig(
      name = "s2", inputView = "stage_isk_in", outputView = "stage_isk_out",
      schema = Some(schema), strict = true,
      initialStateView = Some("stage_isk_state"),
      initialStateKey = Some("conv_id,turn_idx")))(spark)
  }

  test("mongodb input routes to the mongo decoder") {
    import graft.gen.MongoGen
    val wl = MongoGen.workload(seed = 42, nDocs = 10, nTxns = 40)
    MongoGen.toDataFrame(spark, wl).createOrReplaceTempView("stage_mongo_in")
    CdcStage.execute(CdcStageConfig(
      name = "m", inputView = "stage_mongo_in", outputView = "stage_mongo_out",
      schema = Some(MongoGen.schema), strict = true))(spark)
    val got = spark.table("stage_mongo_out").select("_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == wl.finalState.values.map(d => (d.id, d.text)).toSet)
  }

  test("a streaming inputView requires the connector in config (no head() sniff)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EnvelopeGen.RawEnvelope]
    mem.toDF().createOrReplaceTempView("stage_stream_in")
    val cfg = CdcStageConfig(
      name = "s", inputView = "stage_stream_in", outputView = "stage_stream_out",
      schema = Some(schema), strict = false)
    val e = intercept[IllegalArgumentException] { CdcStage.execute(cfg)(spark) }
    assert(e.getMessage.contains("streaming"))
    // with the connector declared, plan building succeeds on a stream
    val out = CdcStage.execute(cfg.copy(connector = Some("mysql")))(spark)
    assert(out.isStreaming)
  }

  test("schema one-of: inline JSON / view resolution, zero or two sources rejected") {
    val json =
      """[
        |{"name":"conv_id","type":"string","nullable":false},
        |{"name":"turn_idx","type":"integer","nullable":false},
        |{"name":"role","type":"string","nullable":false},
        |{"name":"text","type":"string","nullable":false},
        |{"name":"tool","type":"string","nullable":true},
        |{"name":"ts","type":"timestamp","encoding":"micros","nullable":false}
        |]""".stripMargin
    val wl = EnvelopeGen.workload(seed = 44, nConvs = 8, maxTurns = 3, nTxns = 60)
    EnvelopeGen.toDataFrame(spark, wl).createOrReplaceTempView("stage_json_in")
    CdcStage.execute(CdcStageConfig(
      name = "j", inputView = "stage_json_in", outputView = "stage_json_out",
      schemaJson = Some(json), keyNames = Seq("conv_id", "turn_idx"),
      strict = true))(spark)
    assert(viewSet("stage_json_out") == oracleSet(wl))

    import spark.implicits._
    Seq(json).toDF("schema_json").createOrReplaceTempView("stage_schema_view")
    CdcStage.execute(CdcStageConfig(
      name = "v", inputView = "stage_json_in", outputView = "stage_view_out",
      schemaView = Some("stage_schema_view"), keyNames = Seq("conv_id", "turn_idx"),
      strict = true))(spark)
    assert(viewSet("stage_view_out") == oracleSet(wl))

    intercept[IllegalArgumentException] {
      CdcStage.execute(CdcStageConfig(
        name = "x", inputView = "stage_json_in", outputView = "x"))(spark)
    }
    intercept[IllegalArgumentException] {
      CdcStage.execute(CdcStageConfig(
        name = "x", inputView = "stage_json_in", outputView = "x",
        schema = Some(schema), schemaJson = Some(json)))(spark)
    }
  }

  test("ArcSchemaParser parses the reference schema format") {
    val json =
      """[
        |{"name":"conv_id","type":"string","nullable":false},
        |{"name":"turn_idx","type":"integer","nullable":false},
        |{"name":"amount","type":"decimal","precision":20,"scale":2,"nullable":true,
        | "metadata":{"private":true,"securityLevel":2}},
        |{"name":"created","type":"timestamp","timezoneId":"Etc/GMT-5","nullable":false},
        |{"name":"day","type":"date","nullable":true},
        |{"name":"flag","type":"boolean","nullable":true}
        |]""".stripMargin
    val s = ArcSchemaParser.parse(json, keyNames = Seq("conv_id", "turn_idx"))
    assert(s.keyNames == Seq("conv_id", "turn_idx"))
    assert(s.columns.map(_.name) ==
      Seq("conv_id", "turn_idx", "amount", "created", "day", "flag"))
    import org.apache.spark.sql.types._
    assert(s.columns(2).dataType == DecimalType(20, 2))
    assert(s.columns(3).timezoneId == "Etc/GMT-5")
    val meta = ArcSchemaParser.fieldMetadata(json)
    assert(meta("amount").getBoolean("private"))
  }

  test("windowed op-count metrics with watermark (batch + streaming)") {
    val wl = EnvelopeGen.workload(seed = 43, nConvs = 10, maxTurns = 3, nTxns = 100)
    val raw = EnvelopeGen.toDataFrame(spark, wl)
    val counts = MetricsStream.windowedOpCounts(raw, "1 minute", "10 minutes")
    assert(counts.agg(sum(col("n"))).head().getLong(0) == wl.ops.length)

    // streaming: late event beyond the watermark is dropped
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[EnvelopeGen.RawEnvelope]
    val q = MetricsStream.windowedOpCounts(mem.toDF(), "1 minute", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("met_out").start()
    def env(offset: Long, tsMs: Long) = {
      val (k, v) = EnvelopeGen.relationalEnvelope(
        EnvelopeGen.Create(EnvelopeGen.Turn(s"c$offset", 0, "user", "x", None, 1700000000000000L)),
        "mysql", tsMs)
      EnvelopeGen.RawEnvelope(k.getBytes("UTF-8"), v.getBytes("UTF-8"), "t", 0, offset,
        new java.sql.Timestamp(tsMs), 0)
    }
    val base = 1700000000000L
    mem.addData(env(0, base), env(1, base + 60000), env(2, base + 20 * 60000))
    q.processAllAvailable()
    // an event 19 minutes older than the max watermark-ed time → dropped
    mem.addData(env(3, base + 60000))
    q.processAllAvailable()
    mem.addData(env(4, base + 30 * 60000)) // advance watermark to close windows
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("met_out").agg(sum(col("n"))).head().getLong(0)
    assert(emitted <= 4) // the late event never lands in an emitted window
  }
}
