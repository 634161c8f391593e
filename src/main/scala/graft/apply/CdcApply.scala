package graft.apply

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.model.CdcSchema

/** The per-key merge ("apply") stage: reduce all change events per primary
  * key into the final row state.
  *
  * Two modes, mirroring the reference:
  *  - non-strict (DebeziumTransform.scala:740-759): last-writer-wins by
  *    offset. Implemented as ONE declarative hash aggregate
  *    (`max_by(struct(op, after), offset)`): Catalyst plans partial+final
  *    aggregation, so map-side combine reduces every partition to ≤1 row
  *    per key before the shuffle — hot keys cannot skew the reducer, and
  *    the whole stage is codegen'd. This is the 10^10-events hot path.
  *  - strict (reference :683-739): all events of a key are collected,
  *    sorted by offset, and the state-transition chain is validated
  *    (c/r from nothing; u/d from the exact previous after-image; Mongo
  *    patches applied via keyMask). One `flatMapGroups` pass — a
  *    deliberate, stronger semantic than the reference's order-agnostic
  *    `reduceGroups` (which admits non-deterministic merge order,
  *    reference comment :690-699).
  */
object CdcApply {

  val OpCreate = "c"; val OpRead = "r"; val OpUpdate = "u"; val OpDelete = "d"
  val ConnectorState = "state"; val ConnectorMongo = "mongodb"

  // event IR field indices (mirror of reference :190-196)
  val IKey = 0; val IOffset = 1; val IConnector = 2; val IOperation = 3
  val IBefore = 4; val IAfter = 5; val IKeyMask = 6

  /** Non-strict last-writer-wins apply → final table rows
    * (user cols + _topic/_offset). Deletes drop out (after is null). */
  def applyNonStrict(events: DataFrame): DataFrame =
    events
      .groupBy(col("key"))
      .agg(max_by(struct(col("after")), col("offset")).as("_last"))
      .filter(col("_last.after").isNotNull)
      .select("_last.after.*")

  /** Reduce events to ≤1 winning event per key (keeps op + after),
    * without dropping deletes — the delta set fed to the lake MERGE. */
  def reduceToDeltas(events: DataFrame): DataFrame =
    events
      .groupBy(col("key"))
      .agg(max_by(struct(col("operation"), col("offset"), col("after")), col("offset")).as("_last"))
      .select(col("key"), col("_last.operation").as("operation"),
        col("_last.offset").as("offset"), col("_last.after").as("after"))

  /** Inject previous state as synthetic ("state","r") events at offset 0
    * (reference cogroup, DebeziumTransform.scala:660-680). `snapshot` must
    * have the enriched schema (user cols + _topic/_offset). */
  def withInitialState(events: DataFrame, snapshot: DataFrame,
      schema: CdcSchema): DataFrame = {
    val keyCol = concat_ws("|", schema.keyNames.map(n => col(n).cast("string")): _*)
    val stateEvents = snapshot.select(
      keyCol.as("key"),
      lit(0L).as("offset"),
      lit(ConnectorState).as("connector"),
      lit(OpRead).as("operation"),
      lit(null).cast(schema.structType).as("before"),
      struct(schema.structType.fieldNames.map(col).toSeq: _*).as("after"),
      lit(null).cast("array<string>").as("keyMask"))
    events.select("key", "offset", "connector", "operation", "before", "after", "keyMask")
      .unionByName(stateEvents)
  }

  /** Strict apply: offset-ordered chain validation per key.
    * Throws on an invalid transition (mirrors validateEvents /
    * applyMongoPatch, reference :472-524). */
  def applyStrict(events: DataFrame, schema: CdcSchema): DataFrame = {
    val outSchema = schema.structType
    val nFields = outSchema.length
    implicit val rowEnc = Encoders.row(outSchema)
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

    events
      .groupByKey(_.getString(IKey))(Encoders.STRING)
      .flatMapGroups { (key: String, it: Iterator[Row]) =>
        val evs = it.toArray.sortBy(_.getLong(IOffset))
        val isMongo = evs.head.getString(IConnector) == ConnectorMongo
        val last = if (isMongo) applyMongoChain(key, evs, outSchema)
                   else validateChain(key, evs)
        last match {
          case Some(row) => Iterator.single(row)
          case None => Iterator.empty
        }
      }
  }

  /** Relational strict chain validation (reference validateEvents
    * :472-496): adjacent-pair checks, comparing rows on all fields except
    * the trailing `_offset` (the reference's `dropRight(1)`). Returns the
    * final after-image, or None for a delete. */
  private def validateChain(key: String, evs: Array[Row]): Option[Row] = {
    def img(r: Row, idx: Int): Seq[Any] =
      if (r.isNullAt(idx)) null else r.getStruct(idx).toSeq.dropRight(1)
    var i = 0
    while (i < evs.length) {
      val next = evs(i)
      val op = next.getString(IOperation)
      if (i == 0) {
        if (op != OpCreate && op != OpRead)
          throw new IllegalStateException(
            s"key '$key': expected first operation to be 'c'/'r' but got '$op' at offset ${next.getLong(IOffset)}")
      } else {
        val prev = evs(i - 1)
        op match {
          case OpCreate | OpRead =>
            if (!prev.isNullAt(IAfter))
              throw new IllegalStateException(
                s"key '$key': expected previous value to be null for operation '$op' at offset ${next.getLong(IOffset)}")
          case OpUpdate | OpDelete =>
            if (prev.isNullAt(IAfter) || next.isNullAt(IBefore) ||
                img(prev, IAfter) != img(next, IBefore))
              throw new IllegalStateException(
                s"key '$key': expected previous value to equal next before value for operation '$op' at offset ${next.getLong(IOffset)}")
          case other =>
            throw new IllegalStateException(s"key '$key': unknown operation '$other'")
        }
      }
      i += 1
    }
    val last = evs.last
    if (last.getString(IOperation) == OpDelete) None
    else Option(last.getStruct(IAfter))
  }

  /** Mongo strict patch application (reference applyMongoPatch :500-524):
    * c/r replaces, u copies only keyMask fields onto the accumulator,
    * d empties. */
  private def applyMongoChain(key: String, evs: Array[Row],
      outSchema: org.apache.spark.sql.types.StructType): Option[Row] = {
    val empty: Seq[Any] = Seq.fill(outSchema.length)(null)
    var acc: Seq[Any] =
      if (evs.head.isNullAt(IAfter)) empty else evs.head.getStruct(IAfter).toSeq
    var lastOp = evs.head.getString(IOperation)
    var lastAfterRowIsDelete = lastOp == OpDelete
    var i = 1
    while (i < evs.length) {
      val next = evs(i)
      val op = next.getString(IOperation)
      op match {
        case OpCreate | OpRead =>
          if (acc != empty)
            throw new IllegalStateException(
              s"key '$key': expected previous value to be null for operation '$op'")
          acc = next.getStruct(IAfter).toSeq
        case OpUpdate =>
          if (acc == empty)
            throw new IllegalStateException(
              s"key '$key': expected previous value to not be null for operation 'u'")
          val mask = next.getSeq[String](IKeyMask)
          val patch = next.getStruct(IAfter)
          acc = mask.foldLeft(acc) { (seq, field) =>
            val idx = outSchema.fieldIndex(field)
            seq.updated(idx, patch.get(idx))
          }
          // lineage columns track the patch event
          acc = acc
            .updated(outSchema.fieldIndex("_topic"), patch.get(outSchema.fieldIndex("_topic")))
            .updated(outSchema.fieldIndex("_offset"), patch.get(outSchema.fieldIndex("_offset")))
        case OpDelete =>
          if (acc == empty)
            throw new IllegalStateException(
              s"key '$key': expected previous value to not be null for operation 'd'")
          acc = empty
        case other =>
          throw new IllegalStateException(s"key '$key': unknown operation '$other'")
      }
      lastOp = op
      i += 1
    }
    if (lastOp == OpDelete || acc == empty) None
    else Some(Row.fromSeq(acc))
  }
}
