package graft.model

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.types._

import graft.model.{DebeziumEncoding => E}

/** Reads the envelope's own `schema` section (Kafka Connect JSON schema)
  * and maps field descriptors to declared columns — the basis for
  * handling Debezium schema-evolution messages by evolving the lake
  * table in place: a message whose `after` entry carries fields the
  * declared schema lacks yields new NULLABLE columns (additive evolution
  * only, matching the lake's rules).
  *
  * Type mapping mirrors the per-message dispatch the decoder already
  * does (reference DebeziumTransform.scala:287-341, 396-438): logical
  * names win over physical types; timestamps and decimals keep their
  * per-message encodings so later messages with different scale/encoding
  * still decode correctly.
  */
object MessageSchema {

  private val mapper = new ObjectMapper()

  /** Columns declared by the message's after-entry field list. */
  def afterColumns(valueJson: String): Seq[CdcColumn] =
    afterColumnsOfSection(mapper.readTree(valueJson).path("schema"))

  /** Same, over the sliced `schema` SECTION alone (what
    * EnvelopeSlices hands back — the full envelope is never parsed). */
  def afterColumnsOfSection(sectionJson: String): Seq[CdcColumn] =
    afterColumnsOfSection(mapper.readTree(sectionJson))

  private def afterColumnsOfSection(section: JsonNode): Seq[CdcColumn] = {
    val fields = section.path("fields")
    if (!fields.isArray) return Nil
    val after = fields.elements().asScala
      .find(f => f.path("field").asText() == "after")
      .getOrElse(return Nil)
    after.path("fields").elements().asScala.map(columnFromDesc).toSeq
  }

  /** New nullable columns a message declares beyond `declared`. */
  def evolvedColumns(valueJson: String, declared: CdcSchema): Seq[CdcColumn] = {
    val known = declared.columns.map(_.name).toSet
    afterColumns(valueJson).filterNot(c => known.contains(c.name))
      .map(_.copy(nullable = true))
  }

  /** [[evolvedColumns]] over a sliced schema section. */
  def evolvedColumnsOfSection(sectionJson: String, declared: CdcSchema): Seq[CdcColumn] = {
    val known = declared.columns.map(_.name).toSet
    afterColumnsOfSection(sectionJson).filterNot(c => known.contains(c.name))
      .map(_.copy(nullable = true))
  }

  private def columnFromDesc(d: JsonNode): CdcColumn = {
    val name = d.path("field").asText()
    val typ = d.path("type").asText()
    val logical = Option(d.get("name")).map(_.asText()).filter(_.nonEmpty)
    val nullable = !d.has("optional") || d.path("optional").asBoolean(true)
    val scale = Option(d.path("parameters").path("scale").asText(null))
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)

    val (dt, enc): (DataType, DebeziumEncoding) = logical match {
      case Some("io.debezium.time.Timestamp") | Some("io.debezium.time.MicroTimestamp") |
           Some("io.debezium.time.ZonedTimestamp") |
           Some("org.apache.kafka.connect.data.Timestamp") =>
        (TimestampType, E.TimestampMessage)
      case Some("io.debezium.time.Date") | Some("org.apache.kafka.connect.data.Date") =>
        (DateType, E.EpochDays)
      case Some("org.apache.kafka.connect.data.Decimal") =>
        (DecimalType(38, scale), E.DecimalMessage)
      case _ => typ match {
        case "int8" | "int16" | "int32" => (IntegerType, E.Direct)
        case "int64" => (LongType, E.Direct)
        case "boolean" => (BooleanType, E.Direct)
        case "float" | "float32" | "float64" | "double" => (DoubleType, E.Direct)
        case _ => (StringType, E.Direct)
      }
    }
    CdcColumn(name, dt, nullable, enc)
  }
}
