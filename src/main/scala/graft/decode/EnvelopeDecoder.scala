package graft.decode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{CdcColumn, CdcSchema, DebeziumEncoding => E}
import graft.functions.BinaryToDecimal.binaryToDecimal

/** Options for envelope decoding.
  *
  * @param strict  also decode `payload.before` and enforce the reference's
  *                null-shape rules (before null for c/r, after null for d —
  *                DebeziumTransform.scala:581,590); required for strict
  *                chain validation downstream.
  * @param validate enforce per-column nullability (missing/null value on a
  *                non-nullable field errors, reference :307-448) and the
  *                null-shape rules via `raise_error`. Off = fast path.
  */
case class DecodeOptions(strict: Boolean = true, validate: Boolean = true)

/** Decodes Debezium change-event envelopes into the typed event IR.
  *
  * Unlike the reference's per-partition Jackson `mapPartitions`
  * (DebeziumTransform.scala:531-655 — an optimizer-opaque object boundary),
  * the relational path here is pure Catalyst: one `from_json` + per-column
  * coercion expressions. Predicate pushdown, column pruning and whole-stage
  * codegen all survive, and AQE sees real statistics.
  *
  * Event IR columns (mirror of eventSchema, reference :244-254):
  *   key:string, offset:long, connector:string, operation:string,
  *   before:struct, after:struct, keyMask:array<string>
  * where before/after = user columns + `_topic`,`_offset` lineage
  * (reference :237-240).
  */
object EnvelopeDecoder {

  val OpCreate = "c"; val OpRead = "r"; val OpUpdate = "u"; val OpDelete = "d"

  /** Raw JSON shape of the envelope value for from_json (fast path: the
    * per-message `schema` section is skipped by the parser; in non-strict
    * mode the `before` image is also dropped from the parse schema so
    * Jackson skips those tokens entirely). */
  def valueJsonType(schema: CdcSchema, includeBefore: Boolean = true): StructType = {
    val before =
      if (includeBefore) Seq(StructField("before", schema.rawPayloadType)) else Nil
    StructType(Seq(
      StructField("payload", StructType(before ++ Seq(
        StructField("after", schema.rawPayloadType),
        StructField("source", StructType(Seq(
          StructField("connector", StringType),
          StructField("ts_ms", LongType)))),
        StructField("op", StringType),
        StructField("ts_ms", LongType))))))
  }

  def keyJsonType(schema: CdcSchema): StructType =
    StructType(Seq(StructField("payload", schema.rawKeyType)))

  /** Debezium-semantic coercion of one raw column (the declarative mirror
    * of rowFromStringObjectMap's type dispatch, reference :271-468). */
  private def coerce(c: CdcColumn, raw: Column): Column = {
    val v = c.encoding match {
      case E.Direct =>
        c.dataType match {
          case TimestampType => raw.cast(TimestampType)
          case _ => raw
        }
      case E.BooleanAsInt => raw =!= 0
      case E.EpochDays => date_from_unix_date(raw)
      case E.DecimalBytes =>
        val dt = c.dataType.asInstanceOf[DecimalType]
        binaryToDecimal(unbase64(raw), lit(dt.scale), dt.precision, dt.scale)
      case E.DecimalString =>
        raw.cast(c.dataType)
      case E.TimestampWallClockMs =>
        // wall-clock ms re-anchored in the column tz (io.debezium.time.Timestamp)
        to_utc_timestamp(timestamp_millis(raw), c.timezoneId)
      case E.TimestampMicros =>
        // reference truncates micros to millis (:413) — keep parity
        timestamp_millis(graft.functions.ExprUtils.intDiv(raw, 1000L))
      case E.TimestampIsoString => raw.cast(TimestampType)
      case E.MongoDate => raw.getField("$date").cast(TimestampType)
    }
    v.as(c.name)
  }

  /** Build the typed row struct (user cols + lineage) from a raw payload
    * struct; null when the raw payload struct is null. */
  private def payloadStruct(schema: CdcSchema, raw: Column, topic: Column,
      offset: Column, validate: Boolean, side: String): Column = {
    val cols = schema.columns.map { c =>
      val coerced = coerce(c, raw.getField(c.name))
      if (validate && !c.nullable) {
        when(coerced.isNull,
          raise_error(concat(lit(s"missing value for non-nullable field '${c.name}' in $side at offset "),
            offset.cast(StringType))))
          .otherwise(coerced).as(c.name)
      } else coerced
    }
    when(raw.isNotNull,
      struct(cols ++ Seq(topic.as("_topic"), offset.as("_offset")): _*))
      .otherwise(lit(null).cast(structTypeOf(schema)))
  }

  private def structTypeOf(schema: CdcSchema): StructType = schema.structType

  /** Decode relational-connector envelopes (mysql / postgresql / oracle).
    *
    * Input columns: key:binary, value:binary, topic:string, partition:int,
    * offset:long (the DebeziumStringKafkaEvent shape, reference :165-173).
    * Tombstones (null value) are dropped (reference :529-530).
    */
  def decodeRelational(raw: DataFrame, schema: CdcSchema,
      opts: DecodeOptions = DecodeOptions()): DataFrame = {
    val vt = valueJsonType(schema, includeBefore = opts.strict)
    val kt = keyJsonType(schema)

    val parsed = raw
      .filter(col("value").isNotNull)
      .select(
        from_json(col("key").cast(StringType), kt).as("_k"),
        from_json(col("value").cast(StringType), vt).as("_v"),
        col("topic"), col("offset"))

    // canonical key string: key payload values joined with "|" (reference :546)
    val keyCol = concat_ws("|",
      schema.keyColumns.map(c => col(s"_k.payload.${c.name}").cast(StringType)): _*)

    val op = col("_v.payload.op")
    val afterRaw = col("_v.payload.after")
    val beforeRaw = col("_v.payload.before")

    val after0 = payloadStruct(schema, afterRaw, col("topic"), col("offset"),
      opts.validate, "after")
    val before0 = if (opts.strict)
      payloadStruct(schema, beforeRaw, col("topic"), col("offset"),
        opts.validate, "before")
    else lit(null).cast(structTypeOf(schema))

    // null-shape rules (reference :581,590): before null for c/r; after null for d
    val after = if (opts.validate) {
      when(op === OpDelete && afterRaw.isNotNull,
        raise_error(concat(lit("expected 'after' to be null for operation 'd' at offset "),
          col("offset").cast(StringType))))
        .otherwise(after0)
    } else after0
    val before = if (opts.validate && opts.strict) {
      when(op.isin(OpCreate, OpRead) && beforeRaw.isNotNull,
        raise_error(concat(lit("expected 'before' to be null for operation 'c'/'r' at offset "),
          col("offset").cast(StringType))))
        .otherwise(before0)
    } else before0

    // typed primary-key struct from the Kafka key (always present, even for
    // deletes where `after` is null) — feeds the lake MERGE bucket routing
    val pkCol = struct(schema.keyColumns.map(c =>
      coerce(c, col(s"_k.payload.${c.name}"))): _*)

    parsed.select(
      keyCol.as("key"),
      col("offset"),
      col("_v.payload.source.connector").as("connector"),
      op.as("operation"),
      before.as("before"),
      after.as("after"),
      lit(null).cast(ArrayType(StringType, containsNull = false)).as("keyMask"),
      pkCol.as("pk"))
  }

  /** Reduce decoded events to MERGE-ready deltas: ≤1 row per key via LWW,
    * columns = typed key cols + non-key payload + lineage + `operation`.
    * Key columns come from the Kafka key so delete rows route correctly. */
  def toDeltas(events: DataFrame, schema: CdcSchema): DataFrame = {
    // LastByOffset (TypedImperativeAggregate) instead of max_by: max_by's
    // struct buffer forces a SortAggregate fallback; this runs as a true
    // ObjectHashAggregate with partial/final merge (see LastByOffset doc)
    val reduced = events
      .groupBy(col("key"))
      .agg(graft.functions.LastByOffset.lastByOffset(
        struct(col("operation"), col("offset"), col("after"), col("pk")),
        col("offset")).as("_w"),
        count(lit(1)).as("n_events"))
    val keyNames = schema.keyNames.toSet
    val payloadCols = schema.structType.fieldNames.filterNot(keyNames.contains).toSeq
    reduced.select(
      schema.keyNames.map(n => col(s"_w.pk.$n").as(n)) ++
      payloadCols.map(n => col(s"_w.after.$n").as(n)) ++
      Seq(col("_w.operation").as("operation"), col("_w.offset").as("offset"),
        col("n_events")): _*)
  }
}
