package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Scratch tuner for ann_lsh multi-probe configs (not part of the API). */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = sys.env.get("SPARK_GRAFT_TUNE_PLANTED").contains("1")
    val embs = (if (!planted) raw
      else VectorOps.withPlantedTwins(raw, "vec_id", "embedding")).cache()
    val k = if (planted) 1 else 3
    val truth = VectorOps.cosineTopK(embs, "vec_id", "embedding",
        embs, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val configs =
      if (planted) Seq((4, 16, 0), (8, 2, 0), (8, 1, 1), (8, 2, 1), (12, 2, 1), (16, 2, 1))
      else Seq((4, 16, 0), (8, 4, 1), (8, 3, 1), (8, 6, 1),
        (10, 4, 1), (8, 2, 2), (10, 2, 2), (12, 3, 2))
    for ((bits, tables, probe) <- configs) {
      val t0 = System.nanoTime()
      val approx = VectorOps.annLshTopK(embs, "vec_id", "embedding", k,
          bits, tables, probe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      // candidate volume of the same config
      val base = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
      val masks: Seq[Long] = Seq(0L) ++
        (if (probe >= 1) (0 until bits).map(1L << _) else Nil) ++
        (if (probe >= 2) for (i <- 0 until bits; j <- i + 1 until bits)
          yield (1L << i) | (1L << j) else Nil)
      def sigs(side: String) = base.select(col("id").as(side),
        array((0 until tables).map { t =>
          VectorOps.rhpSignature(col("v"), bits, seed = 42 + 101 * t).as(s"s$t")
        }: _*).as("_sigs"))
      val bb = sigs("n").select(col("n"), explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), col("_sigs").getItem(t).as("sig")) }: _*)).as("bucket"))
      val aa = sigs("q").select(col("q"), explode(array((for { t <- 0 until tables; m <- masks }
        yield struct(lit(t).as("t"), col("_sigs").getItem(t).bitwiseXOR(lit(m)).as("sig"))): _*)).as("bucket"))
      val nc = aa.join(bb, Seq("bucket")).filter(col("q") =!= col("n"))
        .select("q", "n").distinct().count()
      val recall = (truth intersect approx).size.toDouble / truth.size
      println(f"bits=$bits%2d tables=$tables%2d probe=$probe recall=$recall%.3f cands=$nc%9d sec=$sec%.1f")
    }
    spark.stop()
  }
}
