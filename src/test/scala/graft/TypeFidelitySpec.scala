package graft

import java.time.{ZoneId, ZonedDateTime}
import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.decode.{DecodeOptions, EnvelopeDecoder}
import graft.gen.EnvelopeGen
import graft.model.{CdcColumn, CdcSchema, DebeziumEncoding => E}

/** Golden round-trips of every supported Debezium physical encoding
  * (mirror of the reference Types suites, MySQLDebeziumTransformSuite.
  * scala:471-569 + KnownData, TestUtils.scala:141-161). */
class TypeFidelitySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  val schema = CdcSchema(Seq(
    CdcColumn("id", IntegerType, nullable = false, E.Direct, keyPart = true),
    CdcColumn("booleanDatum", BooleanType, nullable = false, E.BooleanAsInt),
    CdcColumn("dateDatum", DateType, nullable = false, E.EpochDays),
    CdcColumn("decimalDatum", DecimalType(10, 3), nullable = false, E.DecimalBytes),
    CdcColumn("decimalStrDatum", DecimalType(20, 2), nullable = false, E.DecimalString),
    CdcColumn("doubleDatum", DoubleType, nullable = false),
    CdcColumn("longDatum", LongType, nullable = false),
    CdcColumn("stringDatum", StringType, nullable = false),
    CdcColumn("timeDatum", StringType, nullable = false),
    CdcColumn("tsWallMs", TimestampType, nullable = false,
      E.TimestampWallClockMs, timezoneId = "Etc/GMT-10"),
    CdcColumn("tsMicros", TimestampType, nullable = false, E.TimestampMicros),
    CdcColumn("tsIso", TimestampType, nullable = false, E.TimestampIsoString)))

  // golden values
  val decimalUnscaled = java.math.BigInteger.valueOf(54321) // → 54.321 scale 3
  val decimalB64 = Base64.getEncoder.encodeToString(decimalUnscaled.toByteArray)
  val negUnscaled = java.math.BigInteger.valueOf(-987654)   // → -987.654
  val negB64 = Base64.getEncoder.encodeToString(negUnscaled.toByteArray)
  val wallMs = 1513806414000L // 2017-12-20 21:46:54 wall-clock
  val microsTs = 1513806414123456L

  private def envelope(decB64: String): String =
    s"""{"payload":{"before":null,"after":{
       |"id":1,"booleanDatum":1,"dateDatum":17153,
       |"decimalDatum":"$decB64","decimalStrDatum":"1234567.89",
       |"doubleDatum":42.4242,"longDatum":1520828868,
       |"stringDatum":"test,breakdelimiter","timeDatum":"12:34:56",
       |"tsWallMs":$wallMs,"tsMicros":$microsTs,
       |"tsIso":"2017-12-20T21:46:54.123Z"},
       |"source":{"connector":"mysql","ts_ms":1},"op":"c","ts_ms":1}}"""
      .stripMargin.replace("\n", "")

  private def decodeOne(value: String) = {
    val raw = Seq(EnvelopeGen.RawEnvelope(
      """{"payload":{"id":1}}""".getBytes("UTF-8"), value.getBytes("UTF-8"),
      "t", 0, 7L, new java.sql.Timestamp(0), 0)).toDF()
    EnvelopeDecoder.decodeRelational(raw, schema, DecodeOptions(strict = false, validate = true))
      .select("after.*").collect().head
  }

  test("all encodings decode to golden values") {
    val r = decodeOne(envelope(decimalB64))
    assert(r.getAs[Int]("id") == 1)
    assert(r.getAs[Boolean]("booleanDatum"))
    assert(r.getAs[java.sql.Date]("dateDatum").toString == "2016-12-18")
    assert(r.getAs[java.math.BigDecimal]("decimalDatum").toPlainString == "54.321")
    assert(r.getAs[java.math.BigDecimal]("decimalStrDatum").toPlainString == "1234567.89")
    assert(r.getAs[Double]("doubleDatum") == 42.4242)
    assert(r.getAs[Long]("longDatum") == 1520828868L)
    assert(r.getAs[String]("stringDatum") == "test,breakdelimiter")
    assert(r.getAs[String]("timeDatum") == "12:34:56")
    // wall-clock ms re-anchored in Etc/GMT-10 (reference formula :412)
    val expectedWall = ZonedDateTime.of(1970, 1, 1, 0, 0, 0, 0, ZoneId.of("Etc/GMT-10"))
      .plusNanos(wallMs * 1000000L).toInstant.toEpochMilli
    assert(r.getAs[java.sql.Timestamp]("tsWallMs").getTime == expectedWall)
    // micros truncated to millis (reference :413)
    assert(r.getAs[java.sql.Timestamp]("tsMicros").getTime == microsTs / 1000)
    assert(r.getAs[java.sql.Timestamp]("tsIso").getTime == 1513806414123L)
    // lineage columns
    assert(r.getAs[String]("_topic") == "t")
    assert(r.getAs[Long]("_offset") == 7L)
  }

  test("negative two's-complement decimal bytes decode correctly") {
    val r = decodeOne(envelope(negB64))
    assert(r.getAs[java.math.BigDecimal]("decimalDatum").toPlainString == "-987.654")
  }

  // ---------------------------------------------------------------------
  // per-MESSAGE schema dispatch (reference :334-341, :396-438): the
  // envelope's own schema section decides the logical timestamp type and
  // the decimal scale, message by message
  // ---------------------------------------------------------------------

  private val msgSchema = CdcSchema(Seq(
    CdcColumn("id", IntegerType, nullable = false, E.Direct, keyPart = true),
    CdcColumn("ts", TimestampType, nullable = true, E.TimestampMessage,
      timezoneId = "Australia/Sydney"),
    CdcColumn("amt", DecimalType(10, 3), nullable = true, E.DecimalMessage)))

  private def msgEnvelope(tsJson: String, tsName: String, amtJson: String,
      amtParams: String): String =
    s"""{"schema":{"type":"struct","fields":[
       |{"field":"after","type":"struct","fields":[
       |{"field":"id","type":"int32"},
       |{"field":"ts","type":"int64"${if (tsName.isEmpty) "" else s""","name":"$tsName""""}},
       |{"field":"amt","type":"bytes","name":"org.apache.kafka.connect.data.Decimal"$amtParams}]}]},
       |"payload":{"after":{"id":1,"ts":$tsJson,"amt":$amtJson},
       |"source":{"connector":"mysql","ts_ms":1},"op":"c","ts_ms":1}}"""
      .stripMargin.replace("\n", "")

  private def decodeMsg(value: String) = {
    val raw = Seq(EnvelopeGen.RawEnvelope(
      """{"payload":{"id":1}}""".getBytes("UTF-8"), value.getBytes("UTF-8"),
      "t", 0, 7L, new java.sql.Timestamp(0), 0)).toDF()
    EnvelopeDecoder.decodeRelational(raw, msgSchema, DecodeOptions(strict = false, validate = true))
      .select("after.*").collect().head
  }

  // 2021-07-01 (southern winter) and 2021-01-01 (southern summer, DST):
  // the reference anchors the zone offset at 1970, NOT at the event date
  private val winterMs = 1625097600000L
  private val summerMs = 1609459200000L
  private val scale3B64 = Base64.getEncoder.encodeToString(
    java.math.BigInteger.valueOf(1500).toByteArray) // 1.500 at scale 3

  test("io.debezium.time.Timestamp re-anchors at the 1970 zone offset (DST parity)") {
    for (ms <- Seq(winterMs, summerMs)) {
      val r = decodeMsg(msgEnvelope(ms.toString, "io.debezium.time.Timestamp",
        s""""$scale3B64"""", ""","parameters":{"scale":"3"}"""))
      val expected = ZonedDateTime.of(1970, 1, 1, 0, 0, 0, 0, ZoneId.of("Australia/Sydney"))
        .plusNanos(ms * 1000000L).toInstant.toEpochMilli
      assert(r.getAs[java.sql.Timestamp]("ts").getTime == expected)
    }
  }

  test("MicroTimestamp and ZonedTimestamp numerics truncate micros to millis") {
    for (name <- Seq("io.debezium.time.MicroTimestamp", "io.debezium.time.ZonedTimestamp")) {
      val r = decodeMsg(msgEnvelope("1513806414123456", name,
        s""""$scale3B64"""", ""","parameters":{"scale":"3"}"""))
      assert(r.getAs[java.sql.Timestamp]("ts").getTime == 1513806414123L)
    }
  }

  test("ISO-string timestamps parse regardless of the schema name") {
    val r = decodeMsg(msgEnvelope("\"2017-12-20T21:46:54.123Z\"", "",
      s""""$scale3B64"""", ""","parameters":{"scale":"3"}"""))
    assert(r.getAs[java.sql.Timestamp]("ts").getTime == 1513806414123L)
  }

  test("numeric timestamp without a recognized logical-type name errors") {
    val e = intercept[Exception] {
      decodeMsg(msgEnvelope("123456", "", s""""$scale3B64"""",
        ""","parameters":{"scale":"3"}"""))
    }
    assert(e.getMessage.contains("expected 'name' schema"))
  }

  test("decimal scale comes from the message, not the declared column") {
    // unscaled 1500: at message scale 1 the VALUE is 150.0, re-scaled into
    // the declared (10,3) column as 150.000 — a declared-scale decode
    // would yield 1.500 (off by 10^2)
    val r = decodeMsg(msgEnvelope("null", "io.debezium.time.Timestamp",
      s""""$scale3B64"""", ""","parameters":{"scale":"1"}"""))
    assert(r.getAs[java.math.BigDecimal]("amt").toPlainString == "150.000")
    // message type 'string' parses directly
    val rs = decodeMsg(msgEnvelope("null", "io.debezium.time.Timestamp",
      "\"42.5\"", ""","parameters":{"scale":"1"}""").replace("\"type\":\"bytes\"", "\"type\":\"string\""))
    assert(rs.getAs[java.math.BigDecimal]("amt").toPlainString == "42.500")
  }

  test("postgres lower-cases message field names for case-sensitive schemas") {
    val pgSchema = CdcSchema(Seq(
      CdcColumn("id", IntegerType, nullable = false, E.Direct, keyPart = true),
      CdcColumn("mixedCase", StringType, nullable = false, E.Direct)))
    val value =
      """{"payload":{"after":{"id":1,"mixedcase":"hello"},
        |"source":{"connector":"postgresql","ts_ms":1},"op":"c","ts_ms":1}}"""
        .stripMargin.replace("\n", "")
    val raw = Seq(EnvelopeGen.RawEnvelope(
      """{"payload":{"id":1}}""".getBytes("UTF-8"), value.getBytes("UTF-8"),
      "t", 0, 1L, new java.sql.Timestamp(0), 0)).toDF()
    // a plan-time NON-postgres connector does not fold: the mixed-case
    // lookup finds nothing and the non-nullable column errors
    intercept[Exception] {
      EnvelopeDecoder.decodeRelational(raw, pgSchema,
        DecodeOptions(strict = false, validate = true, connector = Some("mysql"))).collect()
    }
    val r = EnvelopeDecoder.decodeRelational(raw, pgSchema,
      DecodeOptions(strict = false, validate = true, connector = Some("postgresql")))
      .select("after.*").collect().head
    assert(r.getAs[String]("mixedCase") == "hello")
    // connector=None = per-MESSAGE dispatch: the envelope's own
    // source.connector selects the folded wire name row by row
    val rAuto = EnvelopeDecoder.decodeRelational(raw, pgSchema,
      DecodeOptions(strict = false, validate = true))
      .select("after.*").collect().head
    assert(rAuto.getAs[String]("mixedCase") == "hello")
  }

  test("null or unparseable Kafka keys error instead of collapsing to one key") {
    val value = envelope(decimalB64)
    def raw(key: Array[Byte]) = Seq(EnvelopeGen.RawEnvelope(
      key, value.getBytes("UTF-8"), "t", 0, 1L, new java.sql.Timestamp(0), 0)).toDF()
    val eNull = intercept[Exception] {
      EnvelopeDecoder.decodeRelational(raw(null), schema,
        DecodeOptions(strict = false, validate = true)).collect()
    }
    assert(eNull.getMessage.contains("expected 'key' to not be null"))
    val eBad = intercept[Exception] {
      EnvelopeDecoder.decodeRelational(raw("not json".getBytes("UTF-8")), schema,
        DecodeOptions(strict = false, validate = true)).collect()
    }
    assert(eBad.getMessage.contains("key.payload"))
  }
}
