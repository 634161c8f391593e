package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.decode.DecodeOptions
import graft.gen.BenchGen
import graft.lake.LakeTable
import graft.model.CdcSchema
import graft.streaming.CdcPipeline

/** CDC apply-throughput + scaling-efficiency benchmark.
  *
  * Runs the full ingest path (decode → LWW reduce → lake MERGE, in
  * `nBatches` incremental batches) over a pre-materialized raw envelope
  * table at each requested parallelism level, in its own SparkSession.
  * The sandbox stand-in for the north rule's "N vs 4N executors":
  * identical job + identical input at local[N] and local[4N];
  * eff = (throughput@4N / throughput@N) / 4.
  *
  * Env knobs: SPARK_GRAFT_BENCH_EVENTS (default 2e6),
  *            SPARK_GRAFT_BENCH_CORES (default "8,32"),
  *            SPARK_GRAFT_BENCH_STRICT (default false).
  */
object CdcBench {

  case class RunResult(cores: Int, events: Long, wallSec: Double,
      eventsPerSec: Double, finalRows: Long)

  def run(cores: Int, rawPath: String, nEvents: Long, strict: Boolean,
      nBatches: Int, nBuckets: Int): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"cdc-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = Files.createTempDirectory(s"lake-bench-$cores").toString
      val schema = CdcSchema.transcripts
      val table = new LakeTable(spark, dir)
      table.create(schema.structType, schema.keyNames, nBuckets)
      val pipe = new CdcPipeline(spark, schema, table,
        DecodeOptions(strict = strict, validate = false), s"bench-$cores")

      // JIT/codegen warmup on a throwaway table (excluded from timing)
      val warmDir = Files.createTempDirectory(s"lake-warm-$cores").toString
      val warmTable = new LakeTable(spark, warmDir)
      warmTable.create(schema.structType, schema.keyNames, 8)
      val warmPipe = new CdcPipeline(spark, schema, warmTable,
        DecodeOptions(strict = strict, validate = false), "warm")
      warmPipe.processBatch(
        spark.read.parquet(s"$rawPath/batch=0").limit(20000), 0L)

      val t0 = System.nanoTime()
      for (b <- 0 until nBatches) {
        val batch = spark.read.parquet(s"$rawPath/batch=$b")
        pipe.processBatch(batch, b.toLong)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val finalRows = table.read().count()
      val dirF = new java.io.File(dir)
      RunResult(cores, nEvents, wall, nEvents / wall, finalRows)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong
    val coreLevels = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORES", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val strict = sys.env.getOrElse("SPARK_GRAFT_BENCH_STRICT", "false").toBoolean
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BENCH_BATCHES", "4").toInt
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUCKETS", "64").toInt

    // materialize the raw envelope table once (generation excluded from timing)
    val genSpark = SparkSession.builder().master(s"local[${coreLevels.max}]")
      .config("spark.sql.shuffle.partitions", coreLevels.max.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    genSpark.sparkContext.setLogLevel("WARN")
    val rawPath = Files.createTempDirectory("cdc-raw").toString + "/raw"
    val df = BenchGen.envelopes(genSpark, nEvents)
    val maxOff = df.agg(max(col("offset"))).head().getLong(0)
    val step = maxOff / nBatches + 1
    df.withColumn("batch", (col("offset") / step).cast("int"))
      .repartition(coreLevels.max * 2)
      .write.partitionBy("batch").parquet(rawPath)
    val actualEvents = genSpark.read.parquet(rawPath).count()
    val expectKeys = BenchGen.expectedFinalKeys(genSpark, nEvents)
    genSpark.stop()

    val results = coreLevels.map { c =>
      val r = run(c, rawPath, actualEvents, strict, nBatches, nBuckets)
      System.err.println(s"[cdc-bench] cores=$c events=${r.events} wall=${r.wallSec}%.1f eps=${r.eventsPerSec.toLong} finalRows=${r.finalRows} (expect $expectKeys)")
      require(r.finalRows == expectKeys,
        s"parity failure at cores=$c: ${r.finalRows} != $expectKeys")
      r
    }

    val eff = if (results.length >= 2) {
      val lo = results.minBy(_.cores); val hi = results.maxBy(_.cores)
      (hi.eventsPerSec / lo.eventsPerSec) / (hi.cores.toDouble / lo.cores)
    } else 0.0
    val runsJson = results.map(r =>
      s"""{"cores":${r.cores},"events":${r.events},"wallSec":${r.wallSec},"eventsPerSec":${r.eventsPerSec.toLong}}""")
      .mkString("[", ",", "]")
    println(s"""{"metric":"cdc_apply_throughput","unit":"events/sec","strict":$strict,"runs":$runsJson,"scalingEfficiency":$eff}""")
  }
}
