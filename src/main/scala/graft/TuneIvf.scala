package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Scratch tuner for ann_ivf (not part of the API): recall@1 on the
  * planted-twin corpus, candidate-pair volume (probe join output before
  * re-rank) and wall time per (nCentroids, nProbe) config, vs the
  * shipped ann_lsh config and the brute-force pair count. */
object TuneIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val embs = VectorOps.withPlantedTwins(raw, "vec_id", "embedding").cache()
    val n = embs.count()
    val truth = VectorOps.cosineTopK(embs, "vec_id", "embedding",
        embs, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"corpus=$n bruteForcePairs=${n * (n - 1)}")
    for ((nc, np) <- Seq((32, 4), (64, 4), (64, 8), (128, 8), (128, 16))) {
      val t0 = System.nanoTime()
      val approx = VectorOps.annIvfTopK(embs, "vec_id", "embedding", 1, nc, np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (truth intersect approx).size.toDouble / truth.size
      // candidate volume: probed (query, list) pairs joined to list sizes
      val base = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
      import org.apache.spark.sql.expressions.Window
      val cw = Window.orderBy(col("id"))
      val cents = base.orderBy(col("id")).limit(nc)
        .withColumn("cid", row_number().over(cw) - 1)
        .select(col("cid"), col("v").as("_cv"))
      val scored = base.crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          VectorOps.cosine(col("v"), col("_cv")).as("sim"))
      val ord = (col("sim") * lit((1L << 40).toDouble)).cast("long") * nc - col("cid")
      val assigned = scored.groupBy(col("id"))
        .agg(max(ord).as("o"))
        .join(scored.withColumn("o", ord), Seq("id", "o"))
      val listSizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("sz"))
      val pw = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("cid").asc)
      val probes = scored.withColumn("r", row_number().over(pw))
        .filter(col("r") <= np).select(col("id"), col("cid"))
      val cands = probes.join(listSizes, "cid")
        .agg(sum(col("sz"))).head().getLong(0)
      println(f"nCentroids=$nc%4d nProbe=$np%3d recall=$recall%.3f candidatePairs=$cands%10d sec=$sec%.2f")
    }
    spark.stop()
  }
}
