package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `KeyValueGroupedDataset` — the
  * `mapGroupsWithState`/`flatMapGroupsWithState` extension point the
  * built-in stateful operators (dropDuplicates, windowed aggs) cannot
  * cover: bespoke retention, emission and transition policies. The CDC
  * apply path deliberately keeps ITS state in the lake table (replayable,
  * unbounded); these operators are for in-flight stream hygiene where
  * state is bounded by the key space and the policy is custom.
  */
object StatefulOps {

  /** Injective composite state key: JSON-encode the key tuple. A plain
    * `concat_ws("|", ...)` collides — it skips nulls and a '|' inside a
    * string value shifts the parts (("a|b","c") vs ("a","b|c")) — which
    * would silently drop events for a never-seen key. JSON escapes
    * delimiters and keeps nulls distinct (fixed field-name set), so
    * distinct tuples always map to distinct state keys. */
  private def compositeKey(keyCols: Seq[String]) =
    to_json(struct(keyCols.map(col): _*),
      Map("ignoreNullFields" -> "false"))

  /** Streaming first-occurrence-wins dedup: the first event of each key
    * (across ALL micro-batches — state survives the batch boundary) is
    * emitted, every later duplicate is dropped. Built-in
    * `dropDuplicates` covers the plain case; this is the policy hook
    * (swap the Boolean state for a count/TTL to get "at most N per key"
    * or re-emit-after-expiry). State per key: one boolean — bounded by
    * distinct keys, combine-side load spread by the groupByKey shuffle.
    *
    * Works identically on a batch DataFrame (Spark plans the same
    * `FlatMapGroupsWithState` over a one-shot group). Duplicates within
    * one micro-batch keep the first in encounter order — callers that
    * need a deterministic pick across RE-ordered duplicates must feed
    * identical payloads (the CDC gate does) or pre-sort. */
  def streamingFirstByKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val withKey = df.withColumn("_k", compositeKey(keyCols))
    implicit val rowEnc = Encoders.row(withKey.schema)
    val keyIdx = withKey.schema.fieldNames.indexOf("_k")
    withKey
      .groupByKey(_.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); it.take(1) }
      }(Encoders.scalaBoolean, rowEnc)
      .drop("_k")
  }

  /** Running per-key event count, re-emitted on every update (Update
    * mode): the canonical mapGroupsWithState shape — numeric state
    * folded across micro-batches. */
  def runningCountByKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val withKey = df.withColumn("_k", compositeKey(keyCols))
    val keyIdx = withKey.schema.fieldNames.indexOf("_k")
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    implicit val outEnc = Encoders.row(outSchema)
    withKey
      .groupByKey(_.getString(keyIdx))(Encoders.STRING)
      .mapGroupsWithState[Long, Row](GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[Row], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          Row(k, n)
      }(Encoders.scalaLong, outEnc)
  }
}
