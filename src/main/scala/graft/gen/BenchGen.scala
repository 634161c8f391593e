package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, expression-only envelope generator for throughput
  * benchmarks: strict-valid per-key event chains (c → u* → optional d)
  * over the transcripts table, built entirely from `spark.range` +
  * Catalyst expressions — no driver-side materialization, scales to any
  * event count.
  *
  * Offsets are globally unique and per-key monotonic
  * (offset = key*maxEventsPerKey + i). A configurable fraction of "hot"
  * conversations gets `hotFactor`× the events (Zipf-ish skew knob).
  */
object BenchGen {

  /** Constant Debezium schema header (per-message self-describing schema,
    * same shape the reference fixtures carry — pure parse overhead, as in
    * real schema-registry-less Debezium JSON). */
  private val schemaHeader: String = {
    val cols =
      """{"field":"conv_id","type":"string","optional":false},
        |{"field":"turn_idx","type":"int32","optional":false},
        |{"field":"role","type":"string","optional":false},
        |{"field":"text","type":"string","optional":false},
        |{"field":"tool","type":"string","optional":true},
        |{"field":"ts","type":"int64","optional":false,"name":"io.debezium.time.MicroTimestamp"}"""
        .stripMargin.replace("\n", "")
    s"""{"type":"struct","fields":[{"field":"before","type":"struct","optional":true,"fields":[$cols]},{"field":"after","type":"struct","optional":true,"fields":[$cols]},{"field":"source","type":"struct"},{"field":"op","type":"string"},{"field":"ts_ms","type":"int64"}]}"""
  }

  /** Raw envelope DataFrame (key/value/topic/partition/offset/timestamp/
    * timestampType) with ≈`targetEvents` rows. */
  def envelopes(spark: SparkSession, targetEvents: Long,
      turnsPerConv: Int = 20, meanEventsPerKey: Int = 4,
      hotKeyEvery: Int = 1000, hotFactor: Int = 50,
      deleteEveryNthKey: Int = 11): DataFrame = {

    val evBase = meanEventsPerKey
    // solve nKeys so expected events ≈ target
    val hotShare = (hotFactor - 1.0) / hotKeyEvery + 1.0
    val nKeys = math.max(1L, (targetEvents / (evBase * hotShare)).toLong)
    val maxEv = evBase * hotFactor + 2

    val keys = spark.range(0, nKeys)
      .withColumn("conv", (col("id") / turnsPerConv).cast("long"))
      .withColumn("turn", (col("id") % turnsPerConv).cast("int"))
      .withColumn("n_ev",
        when(col("id") % hotKeyEvery === 0, lit(evBase * hotFactor))
          .otherwise(lit(1) + pmod(xxhash64(col("id")), lit(2 * evBase - 1))).cast("int"))

    val ev = keys.select(col("id"), col("conv"), col("turn"), col("n_ev"),
      explode(sequence(lit(0), col("n_ev") - 1)).as("i"))

    val convId = concat(lit("conv-"), lpad(col("conv").cast("string"), 8, "0"))
    def roleOf(rev: Column) = element_at(
      array(lit("user"), lit("assistant"), lit("tool")), (pmod(rev, lit(3)) + 1).cast("int"))
    def textOf(rev: Column) = concat(
      lit("turn "), col("turn").cast("string"), lit(" of "), convId,
      lit(" rev "), rev.cast("string"), lit(" "),
      repeat(lit("plan act observe result state check "), 6))
    def toolOf(rev: Column) = when(pmod(rev, lit(3)) === 2,
      concat(lit("tool-"), pmod(col("id") + rev, lit(8)).cast("string")))
    def tsOf(rev: Column) = lit(1700000000000000L) + col("id") * 1000000L + rev * 1000L

    def rowJson(rev: Column) = to_json(struct(
      convId.as("conv_id"), col("turn").as("turn_idx"),
      roleOf(rev).as("role"), textOf(rev).as("text"),
      toolOf(rev).as("tool"), tsOf(rev).as("ts")))

    val isDelete = (col("id") % deleteEveryNthKey === 0) && (col("i") === col("n_ev") - 1) && (col("n_ev") > 1)
    val op = when(col("i") === 0, lit("c"))
      .otherwise(when(isDelete, lit("d")).otherwise(lit("u")))
    val beforeJson = when(col("i") === 0, lit("null")).otherwise(rowJson(col("i") - 1))
    val afterJson = when(isDelete, lit("null")).otherwise(rowJson(col("i")))

    val offset = col("id") * maxEv + col("i")
    val value = concat(
      lit(s"""{"schema":$schemaHeader,"payload":{"before":"""), beforeJson,
      lit(""","after":"""), afterJson,
      lit(""","source":{"connector":"mysql","ts_ms":0},"op":""""), op,
      lit("""","ts_ms":0}}"""))
    val key = concat(lit("""{"payload":{"conv_id":""""), convId,
      lit("""","turn_idx":"""), col("turn").cast("string"), lit("}}"))

    ev.select(
      key.cast("binary").as("key"),
      value.cast("binary").as("value"),
      lit("cdc.transcripts").as("topic"),
      pmod(col("id"), lit(32)).cast("int").as("partition"),
      offset.as("offset"),
      timestamp_millis(lit(1700000000000L) + offset).as("timestamp"),
      lit(0).as("timestampType"))
  }

  /** Expected final row count for an `envelopes(...)` workload: every key
    * survives except keys ending in a delete. */
  def expectedFinalKeys(spark: SparkSession, targetEvents: Long,
      turnsPerConv: Int = 20, meanEventsPerKey: Int = 4,
      hotKeyEvery: Int = 1000, hotFactor: Int = 50,
      deleteEveryNthKey: Int = 11): Long = {
    val evBase = meanEventsPerKey
    val hotShare = (hotFactor - 1.0) / hotKeyEvery + 1.0
    val nKeys = math.max(1L, (targetEvents / (evBase * hotShare)).toLong)
    spark.range(0, nKeys)
      .withColumn("n_ev",
        when(col("id") % hotKeyEvery === 0, lit(evBase * hotFactor))
          .otherwise(lit(1) + pmod(xxhash64(col("id")), lit(2 * evBase - 1))).cast("int"))
      .filter(!((col("id") % deleteEveryNthKey === 0) && (col("n_ev") > 1)))
      .count()
  }
}
