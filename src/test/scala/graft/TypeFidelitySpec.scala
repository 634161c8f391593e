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
}
