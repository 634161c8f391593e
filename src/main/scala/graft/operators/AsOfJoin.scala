package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * `asofBackward(left, right, keys, lTime, rTime)` attaches to every left
  * row the single most recent right row of the same key with
  * `rightTime <= leftTime` (inclusive), like DuckDB/kdb ASOF JOIN or
  * pandas merge_asof.
  *
  * Implementation is the scalable union–sort–carry-forward pattern rather
  * than an inequality join: tag both sides, union, and run ONE window
  * pass per key ordered by (time, side) where `last(_r, ignoreNulls)`
  * carries the latest right payload forward onto each left row. Cost =
  * one shuffle + one sort over |L|+|R| — no O(|L|·|R|) range-condition
  * blowup, no broadcast requirement; skew follows the key distribution
  * exactly like any window aggregate.
  */
object AsOfJoin {

  /** @param rightPayload right columns to attach (null when no match). */
  def asofBackward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    val rStructT = struct(rightPayload.map(right(_)): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).cast("timestamp").as("_t"),
        lit(1).as("_side"),
        struct(leftPayload.map(col): _*).as("_l"),
        lit(null).cast(right.select(rStructT).schema.head.dataType).as("_r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).cast("timestamp").as("_t"),
        lit(0).as("_side"), // right sorts before left at equal time → inclusive match
        lit(null).cast(l.schema("_l").dataType).as("_l"),
        struct(rightPayload.map(col): _*).as("_r")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keyCols.map(col) ++
        leftPayload.map(c => col(s"_l.$c").as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(c)): _*)
  }
}
