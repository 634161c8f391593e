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

  /** Hot-conversation skew knob: "hotKeyEvery,hotFactor". The default
    * (1000,50) is the realistic mild-Zipf corpus every published number
    * uses; "1000,5000" concentrates ~83% of all events in 0.1% of keys —
    * the worst-case hot-conversation shape the north rule names. The
    * apply path absorbs it structurally (LastByOffset partially
    * aggregates map-side, so a hot key contributes ONE row per input
    * partition to the shuffle; AQE splits oversized post-shuffle
    * partitions) — the A/B evidence lives in BENCH.md. */
  def hotKnob: (Int, Int) = {
    val s = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOT", "1000,50").split(",")
    (s(0).trim.toInt, s(1).trim.toInt)
  }

  def run(cores: Int, rawPath: String, nEventsIgnored: Long, strict: Boolean,
      nBatches: Int, nBuckets: Int): RunResult = {
    val targetEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"cdc-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // scan parallelism must cover the cores: the default 128MB split
      // packs a ~1GB micro-batch into ~8 input tasks, idling 24 of 32
      // cores through the decode stage (measured 0.62 scaling eff)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = Scratch.dir(s"lake-bench-$cores").toString
      val schema = CdcSchema.transcripts
      val table = new LakeTable(spark, dir)
      table.create(schema.structType, schema.keyNames, nBuckets)
      // merge-on-read: commits write only the batch (delta files); a final
      // compaction INSIDE the timed window materializes the same fully-
      // compacted end state the copy-on-write path leaves behind, so the
      // two modes' wall times are comparable. autoCompact>0 additionally
      // folds deltas every K commits (amortized maintenance, also timed).
      val mor = sys.env.getOrElse("SPARK_GRAFT_BENCH_MOR", "false").toBoolean
      val compactEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPACT_EVERY", "0").toInt
      val pipe = new CdcPipeline(spark, schema, table,
        DecodeOptions(strict = strict, validate = false), s"bench-$cores",
        mergeOnRead = mor, autoCompact = compactEvery)

      // JIT/codegen warmup on a throwaway table (excluded from timing)
      val warmDir = Scratch.dir(s"lake-warm-$cores").toString
      val warmTable = new LakeTable(spark, warmDir)
      warmTable.create(schema.structType, schema.keyNames, 8)
      val warmPipe = new CdcPipeline(spark, schema, warmTable,
        DecodeOptions(strict = strict, validate = false), "warm",
        mergeOnRead = mor, autoCompact = compactEvery)
      // contiguous offset prefix, NOT limit(): an arbitrary row subset
      // punches holes in per-key chains and strict validation rejects it
      warmPipe.processBatch(
        spark.read.parquet(s"$rawPath/batch=0").filter(col("offset") < 20000), 0L)
      if (mor) { warmTable.compact(); warmTable.read().count() }
      // force the raw table through the OS page cache so both parallelism
      // levels measure compute, not cold-disk I/O (the input is read-once
      // per run; cache state would otherwise dominate run-to-run variance)
      for (b <- 0 until nBatches)
        spark.read.parquet(s"$rawPath/batch=$b")
          .agg(sum(length(col("value")))).head()

      val nEvents = spark.read.parquet(rawPath).count()
      // mode: e2e (default) = decode→reduce→lake MERGE;
      //       apply = decode→reduce only (noop sink) — isolates the
      //               compute path from single-device write bandwidth;
      //       decode = envelope decode only (noop sink)
      val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "e2e")

      val t0 = System.nanoTime()
      for (b <- 0 until nBatches) {
        val batch = spark.read.parquet(s"$rawPath/batch=$b")
        mode match {
          case "e2e" => pipe.processBatch(batch, b.toLong)
          case "apply" =>
            graft.decode.EnvelopeDecoder.toDeltas(
              graft.decode.EnvelopeDecoder.decodeRelational(batch, schema,
                DecodeOptions(strict = strict, validate = false)), schema)
              .write.format("noop").mode("overwrite").save()
          case "decode" =>
            graft.decode.EnvelopeDecoder.decodeRelational(batch, schema,
              DecodeOptions(strict = strict, validate = false))
              .write.format("noop").mode("overwrite").save()
        }
      }
      if (mor && mode == "e2e") table.compact()
      val wall = (System.nanoTime() - t0) / 1e9
      val (hotEvery, hotFactor) = hotKnob
      val finalRows =
        if (mode == "e2e") table.read().count()
        else BenchGen.expectedFinalKeys(spark, targetEvents,
          hotKeyEvery = hotEvery, hotFactor = hotFactor)
      val expectKeys = BenchGen.expectedFinalKeys(spark, targetEvents,
        hotKeyEvery = hotEvery, hotFactor = hotFactor)
      System.err.println(f"[cdc-bench] mode=$mode cores=$cores events=$nEvents wall=$wall%.1f eps=${(nEvents / wall).toLong} finalRows=$finalRows (expect $expectKeys)")
      require(finalRows == expectKeys,
        s"parity failure at cores=$cores: $finalRows != $expectKeys")
      RunResult(cores, nEvents, wall, nEvents / wall, finalRows)
    } finally spark.stop()
  }

  /** One parallelism level per JVM invocation: a prior run's heap garbage
    * and GC state otherwise contaminate the second measurement (observed:
    * 2nd same-JVM session 2× slower regardless of core count). Re-invoke
    * with the same SPARK_GRAFT_BENCH_RAW to reuse the generated input. */
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong
    val coreLevels = sys.env.getOrElse("SPARK_GRAFT_BENCH_CORES", "32")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val strict = sys.env.getOrElse("SPARK_GRAFT_BENCH_STRICT", "false").toBoolean
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BENCH_BATCHES", "4").toInt
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUCKETS", "64").toInt
    val rawPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_RAW",
      Scratch.dir("cdc-raw").toString + "/raw")

    if (!new java.io.File(rawPath).exists()) {
      // materialize the raw envelope table (generation excluded from timing)
      val genSpark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      genSpark.sparkContext.setLogLevel("WARN")
      val (hotEvery, hotFactor) = hotKnob
      val df = BenchGen.envelopes(genSpark, nEvents,
        hotKeyEvery = hotEvery, hotFactor = hotFactor)
      val maxOff = df.agg(max(col("offset"))).head().getLong(0)
      val step = maxOff / nBatches + 1
      df.withColumn("batch", (col("offset") / step).cast("int"))
        .repartition(64)
        .write.partitionBy("batch").parquet(rawPath)
      genSpark.stop()
    }

    val results = coreLevels.map { c =>
      val r0 = run(c, rawPath, 0L, strict, nBatches, nBuckets)
      r0
    }
    // per-invocation JSON: the orchestrator (tools/scaling_bench.sh)
    // combines levels and computes efficiency across JVMs
    results.foreach { r =>
      println(s"""{"metric":"cdc_apply_throughput","unit":"events/sec","strict":$strict,"cores":${r.cores},"events":${r.events},"wallSec":${r.wallSec},"eventsPerSec":${r.eventsPerSec.toLong},"finalRows":${r.finalRows}}""")
    }
  }
}
