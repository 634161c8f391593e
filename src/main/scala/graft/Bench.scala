package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * then measures the CDC ingest engine's end-to-end apply throughput on a
  * synthesized 1M-event workload. Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // CDC apply throughput FIRST — before the 50+ gate queries: a JVM's
    // 2nd measurement can be up to 2× slower from accumulated GC/codegen
    // state (BENCH.md methodology), and this is the headline engine number.
    // The query sweep below then runs in the "dirty" tail where per-query
    // noise matters less (each is independently short).
    // 1M synthesized Debezium events → decode → LWW reduce → bucketed
    // lake MERGE (2 incremental batches).
    val cdcJson = try {
      import org.apache.spark.sql.functions.{col, max}
      val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "1000000").toLong
      // contiguous offset ranges per batch (as CdcBench does): an
      // interleaved split would replay later-offset events in an earlier
      // batch, violating the ordered-batch contract the merge relies on
      val df = gen.BenchGen.envelopes(spark, nEvents)
      val maxOff = df.agg(max(col("offset"))).head().getLong(0)
      val step = maxOff / 2 + 1
      val raw = df.withColumn("batch", (col("offset") / step).cast("int"))
      val rawPath = java.nio.file.Files.createTempDirectory("bench-raw").toString + "/raw"
      raw.write.partitionBy("batch").parquet(rawPath)
      val actual = spark.read.parquet(rawPath).count()
      val dir = java.nio.file.Files.createTempDirectory("bench-lake").toString
      val schema = model.CdcSchema.transcripts
      val table = new lake.LakeTable(spark, dir)
      table.create(schema.structType, schema.keyNames, nBuckets = 32)
      // merge-on-read commits (write only the reduced batch; O(batch) in
      // table size) + a timed final compaction so the end state is the
      // same fully-compacted table the copy-on-write path leaves behind
      val pipe = new streaming.CdcPipeline(spark, schema, table,
        decode.DecodeOptions(strict = false, validate = false), "bench",
        mergeOnRead = true)
      // JIT/codegen warmup on a throwaway table, excluded from timing
      // (same methodology as CdcBench): a contiguous offset prefix, so
      // per-key chains stay valid
      val warmDir = java.nio.file.Files.createTempDirectory("bench-warm").toString
      val warmTable = new lake.LakeTable(spark, warmDir)
      warmTable.create(schema.structType, schema.keyNames, nBuckets = 8)
      val warmPipe = new streaming.CdcPipeline(spark, schema, warmTable,
        decode.DecodeOptions(strict = false, validate = false), "warm",
        mergeOnRead = true)
      warmPipe.processBatch(
        spark.read.parquet(s"$rawPath/batch=0").filter(col("offset") < 20000), 0L)
      warmTable.compact(); warmTable.read().count()
      val t0 = System.nanoTime()
      pipe.processBatch(spark.read.parquet(s"$rawPath/batch=0"), 0L)
      pipe.processBatch(spark.read.parquet(s"$rawPath/batch=1"), 1L)
      table.compact()
      val wall = (System.nanoTime() - t0) / 1e9
      val finalRows = table.read().count()
      val expect = gen.BenchGen.expectedFinalKeys(spark, nEvents)
      require(finalRows == expect, s"bench parity failure: $finalRows != $expect")
      s""","cdcApply":{"events":$actual,"wallSec":$wall,"eventsPerSec":${(actual / wall).toLong},"finalRows":$finalRows}"""
    } catch { case e: Throwable => s""","cdcApplyError":"${e.getClass.getSimpleName}"""" }

    // a failing query must be VISIBLE in the bench artifact (not a silent
    // -1): record the error class per query and surface the count
    val results: Map[String, Either[String, Double]] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        name -> r
      }
    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(e)) => s""""$k":{"err":"$e"}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => k }.toSeq.sorted
    val errJson =
      if (failed.isEmpty) ""
      else s""","queryErrors":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val total = results.values.collect { case Right(v) => v }.sum

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$errJson$cdcJson}""")
    spark.stop()
  }
}
