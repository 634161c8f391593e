package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.apply.CdcApply
import graft.decode.{DecodeOptions, EnvelopeDecoder, MongoDecoder}
import graft.model.CdcSchema

/** The reference's user-facing stage contract re-expressed as a plain
  * config case class + execute (DebeziumTransform's O1/O2/O18/O19 surface:
  * inputView → decode → merge (optionally seeded from initialStateView) →
  * repartition → outputView, with optional persist). A user of the
  * reference plugin maps its HOCON fields 1:1 onto this class.
  */
case class CdcStageConfig(
    name: String,
    inputView: String,
    outputView: String,
    schema: CdcSchema,
    strict: Boolean = true,
    initialStateView: Option[String] = None,
    initialStateKey: Option[String] = None,
    persist: Boolean = false,
    numPartitions: Option[Int] = None,
    partitionBy: List[String] = Nil)

object CdcStage {

  /** Execute the stage: mirrors DebeziumTransform.execute
    * (reference :202-799) with the engine's operators. Returns the output
    * DataFrame, registered as `outputView`. */
  def execute(cfg: CdcStageConfig)(implicit spark: SparkSession): DataFrame = {
    val raw = spark.table(cfg.inputView)

    // connector routing: peek the first non-tombstone envelope (the
    // reference memoizes per partition, :554-565; a stream has one
    // connector)
    val sample = raw.filter(col("value").isNotNull).select(col("value")).head(1)
    require(sample.nonEmpty, s"input view '${cfg.inputView}' has no events")
    val valueStr = new String(sample.head.getAs[Array[Byte]](0), "UTF-8")
    val connector = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(valueStr)
      val c = m.path("payload").path("source").path("connector").asText("")
      require(c.nonEmpty, "invalid message format: missing payload.source.connector")
      c
    }

    val opts = DecodeOptions(strict = cfg.strict, validate = cfg.strict)
    val events = connector match {
      case "mongodb" => MongoDecoder.decode(raw, cfg.schema, opts)
      case "mysql" | "postgresql" | "oracle" =>
        EnvelopeDecoder.decodeRelational(raw, cfg.schema, opts)
      case other => sys.error(s"unsupported connector '$other'. expected one of " +
        "['mongodb','mysql','postgresql','oracle']")
    }

    // initial-state chaining (reference cogroup :660-680)
    val seeded = cfg.initialStateView match {
      case Some(view) =>
        CdcApply.withInitialState(events, spark.table(view), cfg.schema)
      case None =>
        events.select("key", "offset", "connector", "operation", "before", "after", "keyMask")
    }

    val merged =
      if (cfg.strict) CdcApply.applyStrict(seeded, cfg.schema)
      else CdcApply.applyNonStrict(seeded)

    // O18 repartition
    val repartitioned = (cfg.partitionBy, cfg.numPartitions) match {
      case (Nil, None) => merged
      case (Nil, Some(n)) => merged.repartition(n)
      case (cols, None) => merged.repartition(cols.map(col): _*)
      case (cols, Some(n)) => merged.repartition(n, cols.map(col): _*)
    }

    // O19 view sink + optional cache
    repartitioned.createOrReplaceTempView(cfg.outputView)
    if (cfg.persist && !repartitioned.isStreaming) {
      spark.catalog.cacheTable(cfg.outputView)
      repartitioned.count()
    }
    repartitioned
  }
}
