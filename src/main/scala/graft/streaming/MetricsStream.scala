package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed ingest metrics with watermark-bounded state — the
  * one place this engine keeps Spark streaming state (the CDC apply path
  * itself keeps state in the lake table, not in memory). Runs identically
  * in batch and streaming; in streaming, the watermark garbage-collects
  * window state and drops events later than `watermark`.
  */
object MetricsStream {

  /** Per-window per-operation event counts over raw envelopes.
    * Works on the Kafka-shaped input (uses the broker `timestamp` column
    * as event time and a cheap single-field JSON probe for the op code —
    * no full decode on the metrics path). */
  def windowedOpCounts(raw: DataFrame, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    raw.filter(col("value").isNotNull)
      .select(col("timestamp"),
        get_json_object(col("value").cast("string"), "$.payload.op").as("operation"))
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), windowLen), col("operation"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("operation"), col("n"))
}
