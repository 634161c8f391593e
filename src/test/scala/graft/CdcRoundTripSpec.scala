package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apply.CdcApply
import graft.decode.{DecodeOptions, EnvelopeDecoder}
import graft.gen.EnvelopeGen
import graft.model.CdcSchema

/** Round-trip parity: synthetic Debezium workload → decode → apply →
  * final table state must equal the in-memory oracle fold (the analog of
  * the reference's randomized live-DB parity tests,
  * MySQLDebeziumTransformSuite.scala:281-469). */
class CdcRoundTripSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  val schema = CdcSchema.transcripts

  private def decoded(wl: EnvelopeGen.Workload, connector: String,
      strict: Boolean, shuffleSeed: Option[Long] = None): DataFrame =
    EnvelopeDecoder.decodeRelational(
      EnvelopeGen.toDataFrame(spark, wl, connector, shuffleSeed = shuffleSeed),
      schema, DecodeOptions(strict = strict, validate = true))

  /** Final state rows as a comparable set (user cols; ts truncated to
    * millis by the reference's MicroTimestamp rule). */
  private def asSet(df: DataFrame) =
    df.select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getTimestamp(5).getTime))
      .toSet

  private def oracleSet(wl: EnvelopeGen.Workload) =
    EnvelopeGen.expectedRows(wl)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6 / 1000)) // micros → ms truncation
      .toSet

  test("non-strict LWW apply matches oracle (mysql, in-order)") {
    val wl = EnvelopeGen.workload(seed = 1, nConvs = 40, maxTurns = 6, nTxns = 500)
    val got = asSet(CdcApply.applyNonStrict(decoded(wl, "mysql", strict = false)))
    assert(got == oracleSet(wl))
  }

  test("non-strict LWW apply is order-independent (shuffled delivery)") {
    val wl = EnvelopeGen.workload(seed = 2, nConvs = 30, maxTurns = 5, nTxns = 400)
    val got = asSet(CdcApply.applyNonStrict(decoded(wl, "mysql", strict = false,
      shuffleSeed = Some(99))))
    assert(got == oracleSet(wl))
  }

  test("strict chain-validated apply matches oracle (postgresql)") {
    val wl = EnvelopeGen.workload(seed = 3, nConvs = 25, maxTurns = 5, nTxns = 300)
    val got = asSet(CdcApply.applyStrict(decoded(wl, "postgresql", strict = true), schema))
    assert(got == oracleSet(wl))
  }

  test("strict apply with Zipf-skewed hot conversations") {
    val wl = EnvelopeGen.workload(seed = 4, nConvs = 50, maxTurns = 6, nTxns = 800,
      zipfSkew = 3.0)
    val got = asSet(CdcApply.applyStrict(decoded(wl, "mysql", strict = true), schema))
    assert(got == oracleSet(wl))
  }

  test("strict apply rejects a broken chain (update without prior state)") {
    import EnvelopeGen._
    val t = Turn("conv-x", 0, "user", "hello", None, 1700000000000000L)
    val t2 = t.copy(text = "hello2")
    val wl = Workload(IndexedSeq(Update(t, t2)), Map((("conv-x", 0), t2)))
    val ex = intercept[Exception] {
      CdcApply.applyStrict(decoded(wl, "mysql", strict = true), schema).collect()
    }
    assert(ex.getMessage.contains("expected first operation") ||
      Option(ex.getCause).exists(_.getMessage.contains("expected first operation")))
  }

  test("decode validate rejects null in non-nullable column") {
    val raw = Seq(EnvelopeGen.RawEnvelope(
      """{"payload":{"conv_id":"c1","turn_idx":0}}""".getBytes("UTF-8"),
      """{"payload":{"before":null,"after":{"conv_id":"c1","turn_idx":0,"role":null,"text":"x","tool":null,"ts":1700000000000000},"source":{"connector":"mysql","ts_ms":1},"op":"c","ts_ms":1}}""".getBytes("UTF-8"),
      "t", 0, 0L, new java.sql.Timestamp(0), 0)).toDF()
    val ex = intercept[Exception] {
      EnvelopeDecoder.decodeRelational(raw, schema, DecodeOptions(strict = false, validate = true))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("non-nullable")))
  }

  test("tombstones are dropped") {
    val wl = EnvelopeGen.workload(seed = 5, nConvs = 5, maxTurns = 3, nTxns = 20)
    val df = EnvelopeGen.toDataFrame(spark, wl, "mysql")
    val withTombstones = df.unionByName(
      df.limit(3).withColumn("value", lit(null).cast("binary")))
    val got = asSet(CdcApply.applyNonStrict(EnvelopeDecoder.decodeRelational(
      withTombstones, schema, DecodeOptions(strict = false))))
    assert(got == oracleSet(wl))
  }
}
