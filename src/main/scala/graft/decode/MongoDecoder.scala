package graft.decode

import java.sql.{Date, Timestamp}
import java.time.Instant

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.model.{CdcColumn, CdcSchema, DebeziumEncoding => E}

/** MongoDB-connector envelope decode (reference DebeziumTransform.scala:
  * 594-641). Mongo events carry BSON extended JSON *strings* and partial
  * `$set`/`$unset` patches, so this path is typed `mapPartitions` (one
  * Jackson mapper per partition, as the reference does at :531-534) — the
  * one place the engine deliberately leaves Catalyst expressions. The
  * envelope itself is split byte-level first (EnvelopeSlices.parseMongo:
  * the schema header never reaches Jackson); the mapper only parses the
  * extended-JSON documents, with the full map walk kept as the fallback
  * for malformed envelopes so legacy errors are preserved.
  *
  * Semantics replicated:
  *  - op c/r: `payload.after` is a JSON document string → full row;
  *  - op u: `payload.patch` is either `{"$set":{...},"$unset":{...}}`
  *    (partial update: keyMask = touched fields, untouched non-nullable
  *    fields get masked placeholder defaults, reference :268-270,307-464)
  *    or a full-replacement document (must carry `_id`, which is dropped);
  *    missing id is recovered from the Kafka key (reference :630-634);
  *  - op d: after is null; row deleted downstream;
  *  - requires strict mode (reference :561) — patches are not
  *    last-writer-wins mergeable.
  */
object MongoDecoder {

  def decode(raw: DataFrame, schema: CdcSchema,
      opts: DecodeOptions = DecodeOptions()): DataFrame = {
    require(opts.strict, "connector 'mongodb' requires strict mode")
    val outType = schema.structType
    val eventType = StructType(Seq(
      StructField("key", StringType),
      StructField("offset", LongType),
      StructField("connector", StringType),
      StructField("operation", StringType),
      StructField("before", outType),
      StructField("after", outType),
      StructField("keyMask", ArrayType(StringType, containsNull = false)),
      StructField("pk", StructType(schema.keyColumns.map(c =>
        StructField(c.name, c.dataType, c.nullable))))))
    implicit val enc = Encoders.row(eventType)
    val cols = schema.columns
    val keyCols = schema.keyColumns

    raw.select("key", "value", "topic", "offset")
      .filter("value is not null")
      .mapPartitions { it =>
        val mapper = new ObjectMapper()
        it.map { r =>
          val keyStr = new String(r.getAs[Array[Byte]]("key"), "UTF-8")
          val valueBytes = r.getAs[Array[Byte]]("value")
          val topic = r.getAs[String]("topic")
          val offset = r.getAs[Long]("offset")

          val keyMap = asScalaMap(mapper.readValue(keyStr, classOf[java.util.Map[String, Object]]))
          val keyPayload = asScalaMap(keyMap.getOrElse("payload",
            sys.error("invalid message: missing key.payload")))
          val key = keyPayload.values.map(String.valueOf).mkString("|")

          // fast path: byte-level envelope split (the schema header — the
          // bulk of the bytes — never reaches Jackson); the Jackson map
          // walk remains as the fallback so malformed envelopes keep
          // their legacy error behavior
          val sliced = graft.functions.EnvelopeSlices.parseMongo(valueBytes)
          val (op, afterStrOpt, patchStrOpt): (String, Option[String], Option[String]) =
            if (sliced != null) {
              (sliced.getUTF8String(0).toString,
                if (sliced.isNullAt(1)) None else Some(sliced.getUTF8String(1).toString),
                if (sliced.isNullAt(2)) None else Some(sliced.getUTF8String(2).toString))
            } else {
              val valueStr = new String(valueBytes, "UTF-8")
              val valueMap = asScalaMap(mapper.readValue(valueStr, classOf[java.util.Map[String, Object]]))
              val payload = asScalaMap(valueMap.getOrElse("payload",
                sys.error("invalid message: missing value.payload")))
              (payload.getOrElse("op", sys.error("missing op")).asInstanceOf[String],
                payload.get("after").map(_.asInstanceOf[String]),
                payload.get("patch").map(_.asInstanceOf[String]))
            }

          val keyMask = scala.collection.mutable.LinkedHashSet[String]()
          val (afterRow, placeholders): (Row, Boolean) = op match {
            case "c" | "r" =>
              val doc = asScalaMap(mapper.readValue(
                afterStrOpt.getOrElse(sys.error("missing after")),
                classOf[java.util.Map[String, Object]]))
              (buildRow(cols, doc, topic, offset, placeholders = false), false)
            case "u" =>
              val patchStr = patchStrOpt.getOrElse(sys.error("missing patch"))
              val patchDoc = asScalaMap(mapper.readValue(patchStr, classOf[java.util.Map[String, Object]]))
              var update = scala.collection.mutable.LinkedHashMap[String, Object]()
              patchDoc.get("$set").foreach { s =>
                asScalaMap(s).foreach { case (k, v) => update(k) = v; keyMask += k }
              }
              patchDoc.get("$unset").foreach { u =>
                asScalaMap(u).foreach { case (k, v) =>
                  if (truthy(v)) { update(k) = null; keyMask += k }
                }
              }
              if (!patchDoc.contains("$set") && !patchDoc.contains("$unset")) {
                // full document replace (reference :622-628)
                if (!patchDoc.contains("_id"))
                  sys.error("expected '$set'/'$unset' for partial updates or '_id' for full replaces")
                update = scala.collection.mutable.LinkedHashMap(patchDoc.toSeq: _*)
                update.remove("_id")
                keyCols.foreach(c => update.remove(c.name))
                cols.filterNot(_.keyPart).foreach(c => keyMask += c.name)
              }
              // recover the document id from the Kafka key (reference
              // :630-634) — under the DECLARED key column name, not the
              // literal "_id" the reference assumes (a Mongo-fed table
              // whose declared key is named differently would otherwise
              // build its after-image with a placeholder key)
              val keyName = keyCols.head.name
              if (!update.contains(keyName)) {
                val id = keyPayload.getOrElse("id",
                  keyPayload.values.headOption.getOrElse(sys.error("missing key.payload.id")))
                update(keyName) = id
                keyCols.foreach(c => keyMask += c.name)
              }
              (buildRow(cols, update.toMap, topic, offset, placeholders = true), true)
            case "d" => (null, false)
            case other => sys.error(s"unknown operation '$other'")
          }

          val pk = Row.fromSeq(keyCols.map { c =>
            coerceValue(c, keyPayload.get(if (c.name == "_id") "id" else c.name).orNull,
              placeholders = false)
          })
          Row(key, offset, "mongodb", op, null, afterRow, keyMask.toSeq, pk)
        }
      }
  }

  private def truthy(v: Any): Boolean = v match {
    case b: java.lang.Boolean => b
    case i: java.lang.Integer => i != 0
    case _ => false
  }

  private def asScalaMap(o: Any): Map[String, Object] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
    case null => sys.error("expected object, got null")
    case other => sys.error(s"expected object, got ${other.getClass.getName}")
  }

  /** Unwrap Mongo extended-JSON scalar wrappers ({"$numberLong": "5"} …). */
  private def unwrap(v: Any): Any = v match {
    case m: java.util.Map[_, _] if m.size == 1 =>
      val k = m.keySet.asScala.head.toString
      val inner = m.values.asScala.head
      k match {
        case "$numberInt" => Integer.valueOf(inner.toString)
        case "$numberLong" => java.lang.Long.valueOf(inner.toString)
        case "$numberDouble" => java.lang.Double.valueOf(inner.toString)
        case "$numberDecimal" => new java.math.BigDecimal(inner.toString)
        case "$date" => inner // handled by temporal coercions
        case _ => v
      }
    case _ => v
  }

  /** Mirror of the reference's schema-directed field coercion for the
    * Mongo (schema-less) connector: rowFromStringObjectMap with
    * connector=mongodb (DebeziumTransform.scala:271-468). */
  private def buildRow(cols: Seq[CdcColumn], doc: Map[String, Object],
      topic: String, offset: Long, placeholders: Boolean): Row = {
    val vals = cols.map { c =>
      val name = if (c.keyPart && c.name == "_id") "_id" else c.name
      coerceValue(c, doc.get(name).orNull, placeholders)
    }
    Row.fromSeq(vals ++ Seq(topic, offset))
  }

  private[decode] def coerceValue(c: CdcColumn, raw0: Any, placeholders: Boolean): Any = {
    val raw = unwrap(raw0)
    def missing(): Any =
      if (c.nullable) null
      else if (placeholders) placeholderFor(c)
      else sys.error(s"missing value for non-nullable field '${c.name}'")
    if (raw == null) return missing()
    (c.dataType, raw) match {
      case (BooleanType, b: java.lang.Boolean) => b
      case (BooleanType, i: java.lang.Integer) => i != 0
      case (BooleanType, s: String) => s.toBoolean
      case (IntegerType, i: java.lang.Integer) => i
      case (IntegerType, l: java.lang.Long) => l.toInt
      case (IntegerType, s: String) => s.toInt
      case (LongType, l: java.lang.Long) => l
      case (LongType, i: java.lang.Integer) => i.toLong
      case (LongType, s: String) => s.toLong
      case (DoubleType, d: java.lang.Double) => d
      case (DoubleType, f: java.lang.Float) => f.toDouble
      case (DoubleType, i: java.lang.Integer) => i.toDouble
      case (DoubleType, s: String) => s.toDouble
      case (StringType, s: String) => s
      case (dt: DecimalType, bd: java.math.BigDecimal) => bd.setScale(dt.scale)
      case (dt: DecimalType, s: String) => new java.math.BigDecimal(s).setScale(dt.scale)
      case (DateType, m: java.util.Map[_, _]) =>
        new Date(Instant.parse(m.values.asScala.head.toString).toEpochMilli)
      case (DateType, i: java.lang.Integer) => new Date(i.toLong * 86400000L)
      case (DateType, l: java.lang.Long) => new Date(l * 86400000L)
      case (TimestampType, m: java.util.Map[_, _]) =>
        new Timestamp(Instant.parse(m.values.asScala.head.toString).toEpochMilli)
      case (TimestampType, s: String) => new Timestamp(Instant.parse(s).toEpochMilli)
      case (TimestampType, l: java.lang.Long) if c.encoding == E.TimestampMicros =>
        new Timestamp(l / 1000)
      case (TimestampType, l: java.lang.Long) => new Timestamp(l)
      case (dt, v) => sys.error(
        s"'${v.getClass.getName}' does not match expected data type '${dt.simpleString}' for field '${c.name}'")
    }
  }

  private def placeholderFor(c: CdcColumn): Any = c.dataType match {
    case BooleanType => false
    case IntegerType => 0
    case LongType => 0L
    case DoubleType => 0.0
    case StringType => ""
    case dt: DecimalType => java.math.BigDecimal.ZERO.setScale(dt.scale)
    case DateType => new Date(0)
    case TimestampType => new Timestamp(0)
    case other => sys.error(s"no placeholder for ${other.simpleString}")
  }
}
