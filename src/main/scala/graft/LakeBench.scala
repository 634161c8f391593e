package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.model.CdcSchema

/** Commit-cost-vs-table-size benchmark: how long does ONE small merge
  * take against a table of N rows, copy-on-write vs merge-on-read?
  *
  * The batch keys are uniform across all buckets — the worst case for
  * bucket-granularity copy-on-write (every bucket is affected, so the
  * commit reads and rewrites the whole table). Merge-on-read writes only
  * the batch's delta files; its commit cost must stay flat as the table
  * grows. The MoR read tax (LWW reconstruction) and compaction cost are
  * measured separately so the trade is visible, not hidden.
  *
  * Env knobs: SPARK_GRAFT_LAKEBENCH_SIZES (default "1000000,4000000,16000000"),
  *            SPARK_GRAFT_LAKEBENCH_BATCH (default 200000),
  *            SPARK_GRAFT_CPUS (default 8).
  * Prints one JSON line per (size, mode).
  */
object LakeBench {

  private val schema = CdcSchema.transcripts

  /** Expression-only synthetic rows in the transcripts shape (no JSON
    * decode — this bench isolates COMMIT cost). */
  private def rows(spark: SparkSession, n: Long, offsetBase: Long): DataFrame =
    spark.range(n).select(
      concat(lit("conv-"), (col("id") / 4).cast("long").cast("string")).as("conv_id"),
      pmod(col("id"), lit(4)).cast("int").as("turn_idx"),
      when(pmod(col("id"), lit(2)) === 0, "user").otherwise("assistant").as("role"),
      concat(lit("turn text body padding padding padding padding padding "),
        col("id").cast("string")).as("text"),
      lit(null).cast("string").as("tool"),
      timestamp_millis(lit(1700000000000L) + col("id")).as("ts"),
      lit("bench.transcripts").as("_topic"),
      (col("id") + offsetBase).as("_offset"))

  /** A reduced delta batch (toDeltas shape) over a uniform key sample. */
  private def deltaBatch(spark: SparkSession, tableRows: Long, batch: Long,
      offsetBase: Long): DataFrame = {
    // every ~tableRows/batch-th key updated: uniform over all buckets
    val stride = math.max(1L, tableRows / batch)
    spark.range(batch).select((col("id") * stride).as("k")).select(
      concat(lit("conv-"), (col("k") / 4).cast("long").cast("string")).as("conv_id"),
      pmod(col("k"), lit(4)).cast("int").as("turn_idx"),
      when(pmod(col("k"), lit(2)) === 0, "user").otherwise("assistant").as("role"),
      concat(lit("UPDATED text body padding padding padding padding padding "),
        col("k").cast("string")).as("text"),
      lit(null).cast("string").as("tool"),
      timestamp_millis(lit(1700000000000L) + col("k")).as("ts"),
      lit("bench.transcripts").as("_topic"),
      (col("k") + offsetBase).as("_offset"),
      lit("u").as("operation"),
      (col("k") + offsetBase).as("offset"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_LAKEBENCH_SIZES", "1000000,4000000,16000000")
      .split(",").map(_.trim.toLong).toSeq
    val batch = sys.env.getOrElse("SPARK_GRAFT_LAKEBENCH_BATCH", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (size <- sizes; mode <- Seq("cow", "mor")) {
      val dir = Scratch.dir(s"lakebench-$mode-$size").toString
      val t = new LakeTable(spark, dir)
      t.create(schema.structType, schema.keyNames, nBuckets = 64)
      t.append(rows(spark, size, 0L))
      val deltas = deltaBatch(spark, size, batch, size)
      // warm: plan + page cache for the delta side (cheap, expression-only)
      deltas.count()

      val t0 = System.nanoTime()
      if (mode == "cow") t.merge(deltas, "bench", 0L)
      else t.mergeDeltas(deltas, "bench", 0L)
      val commitSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val readRows = t.read().count()
      val readSec = (System.nanoTime() - t1) / 1e9

      val compactSec = if (mode == "mor") {
        val t2 = System.nanoTime()
        t.compact()
        (System.nanoTime() - t2) / 1e9
      } else 0.0

      require(readRows == size, s"parity: $readRows != $size")
      println(s"""{"metric":"lake_commit","mode":"$mode","tableRows":$size,""" +
        s""""batchRows":$batch,"commitSec":$commitSec,"readSec":$readSec,""" +
        s""""compactSec":$compactSec}""")
    }
    spark.stop()
  }
}
