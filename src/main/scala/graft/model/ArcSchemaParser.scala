package graft.model

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.types._

/** Parser for Arc-style schema JSON (the reference's declared-schema
  * format: `schema` / `schemaURI` / `schemaView` documents — an array of
  * column objects with name/type/nullable/precision/scale/timezoneId,
  * shape per reference TestUtils.scala:163-338). Produces a [[CdcSchema]];
  * `keyNames` marks the primary-key columns (Arc has no PK concept — the
  * reference takes the key from the Kafka message key instead).
  */
object ArcSchemaParser {
  import DebeziumEncoding._

  private val mapper = new ObjectMapper()

  def parse(json: String, keyNames: Seq[String]): CdcSchema = {
    val root = mapper.readTree(json)
    require(root.isArray, "Arc schema must be a JSON array of column objects")
    val cols = root.elements().asScala.map { n =>
      val name = req(n, "name").asText()
      val nullable = if (n.has("nullable")) n.get("nullable").asBoolean() else true
      val tz = if (n.has("timezoneId")) n.get("timezoneId").asText() else "UTC"
      val (dt, enc): (DataType, DebeziumEncoding) = req(n, "type").asText() match {
        case "boolean" => (BooleanType, BooleanAsInt)
        case "date" => (DateType, EpochDays)
        case "decimal" =>
          val p = if (n.has("precision")) n.get("precision").asInt() else 38
          val s = if (n.has("scale")) n.get("scale").asInt() else 18
          // per-message scale dispatch (reference :334-341); the optional
          // "encoding" hint pins a fixed wire form instead
          (DecimalType(p, s), decimalEncoding(n, name))
        case "double" => (DoubleType, Direct)
        case "integer" => (IntegerType, Direct)
        case "long" => (LongType, Direct)
        case "string" => (StringType, Direct)
        case "time" => (StringType, Direct) // Arc keeps time-of-day as string
        // the reference dispatches timestamps on EACH message's schema
        // section name (io.debezium.time.{Timestamp,MicroTimestamp,
        // ZonedTimestamp}, reference :396-438); "encoding" hint opts into
        // a fixed fast path that skips the schema-section parse
        case "timestamp" => (TimestampType, timestampEncoding(n, name))
        case other => sys.error(s"unsupported Arc column type '$other' for '$name'")
      }
      CdcColumn(name, dt, nullable, enc, keyPart = keyNames.contains(name), timezoneId = tz)
    }.toSeq
    val missing = keyNames.filterNot(k => cols.exists(_.name == k))
    require(missing.isEmpty, s"key columns not in schema: ${missing.mkString(",")}")
    CdcSchema(cols)
  }

  /** Column metadata (the Arc `metadata` object) as Spark field metadata,
    * for O17-style metadata stamping. */
  def fieldMetadata(json: String): Map[String, Metadata] = {
    val root = mapper.readTree(json)
    root.elements().asScala.flatMap { n =>
      if (n.has("metadata"))
        Some(req(n, "name").asText() -> Metadata.fromJson(n.get("metadata").toString))
      else None
    }.toMap
  }

  private def timestampEncoding(n: JsonNode, name: String): DebeziumEncoding =
    if (!n.has("encoding")) TimestampMessage
    else n.get("encoding").asText() match {
      case "message" => TimestampMessage
      case "millis-wallclock" => TimestampWallClockMs
      case "micros" => TimestampMicros
      case "zoned" => TimestampZoned
      case "iso" => TimestampIsoString
      case other => sys.error(s"unsupported timestamp encoding '$other' for '$name'")
    }

  private def decimalEncoding(n: JsonNode, name: String): DebeziumEncoding =
    if (!n.has("encoding")) DecimalMessage
    else n.get("encoding").asText() match {
      case "message" => DecimalMessage
      case "bytes" => DecimalBytes
      case "string" => DecimalString
      case other => sys.error(s"unsupported decimal encoding '$other' for '$name'")
    }

  private def req(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    require(v != null, s"Arc schema column missing required field '$field': $n")
    v
  }
}
