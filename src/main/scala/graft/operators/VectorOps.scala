package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity operators over `array<float>` embedding columns.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * computes dot products with the native FloatVectorDot codegen expression
  * (tight primitive loop; the zip_with/aggregate HOF formulation allocates
  * an intermediate array per pair — 13× slower measured). The LSH path
  * buckets vectors by random-hyperplane signatures so at 100 TB each probe
  * only joins its own bucket (equi-join on the signature) instead of the
  * full corpus.
  */
object VectorOps {

  /** Dot product of two array<float> columns (float64 accumulate) —
    * native codegen expression (see FloatVectorDot: the zip_with/aggregate
    * HOF formulation allocates an intermediate array per pair). */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVectorDot.dotF(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (null when either vector has zero norm). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for every query vector, the `k` nearest
    * corpus vectors by cosine (descending), rank 1..k. The query side is
    * broadcast; output carries ids + rank (ranks are stable across engines
    * even when the float similarity differs in the last ulp). */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("sim"))
    // top-k per query via max_by on packed struct would need k>1; use window.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products
    * with deterministic pseudo-random hyperplanes — ONE pass over the
    * vector for all bits via the RhpSignature codegen expression (the
    * per-bit zip_with/aggregate HOF formulation re-walks the vector once
    * per bit with interpreted lambdas). Reproducible with no stored
    * model. */
  def rhpSignature(vec: Column, bits: Int, seed: Int = 42): Column =
    graft.functions.RhpSignature.rhpSignature(vec, bits, seed)

  /** Bucketed ANN with `tables` independent RHP hash tables: candidate
    * neighbors share a bucket in ANY table (union of per-table equi-joins,
    * deduped on ids only), then exact cosine re-rank. Recall is tunable
    * via (bits, tables): more tables → higher recall, more candidate
    * volume; more bits → finer buckets. Never an O(n²) cross join. */
  def annLshTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      bits: Int = 8, tables: Int = 1): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sig = base.select(col("id"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), rhpSignature(col("v"), bits, seed = 42 + 101 * t).as("sig"))
      }: _*)).as("bucket"))
    val a = sig.select(col("id").as("query_id"), col("bucket"))
    val b = sig.select(col("id").as("neighbor_id"), col("bucket"))
    val cands = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = base.select(col("id").as("query_id"), col("v").as("_qv"))
    val cv = base.select(col("id").as("neighbor_id"), col("v").as("_cv"))
    val scored = cands.join(qv, "query_id").join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** EXACT all-pairs cosine ≥ `threshold` via a tiled block self-join.
    *
    * Ids hash into `nBlocks` blocks; each block pair (i ≤ j) is one
    * equi-join tile, so the inherently quadratic work distributes evenly
    * across nBlocks(nBlocks+1)/2 independent shuffle groups — no
    * BroadcastNestedLoopJoin, no driver fan-out, per-task memory bounded
    * by n/nBlocks rows per side. Use when the threshold sits where LSH
    * recall can't be guaranteed (pairs at the decision boundary); raise
    * `nBlocks` with corpus size so tiles stay executor-sized. */
  def cosineDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      pmod(hash(col(idCol)), lit(nBlocks)).as("blk"))
    val spark = df.sparkSession
    import spark.implicits._
    val tiles = broadcast(
      (for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j))
        .toDF("bi", "bj"))
    val a = v.join(tiles, col("blk") === col("bi"))
      .select(col("bi"), col("bj"), col("id").as("id_l"),
        col("v").as("_vl"), col("nrm").as("_nl"))
    val b = v.join(tiles, col("blk") === col("bj"))
      .select(col("bi").as("bi2"), col("bj").as("bj2"), col("id").as("id_r"),
        col("v").as("_vr"), col("nrm").as("_nr"))
    a.join(b, col("bi") === col("bi2") && col("bj") === col("bj2"))
      .filter(col("bi") < col("bj") || col("id_l") < col("id_r"))
      .select(
        least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        (dot(col("_vl"), col("_vr")) / (col("_nl") * col("_nr"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` (id_a<id_b),
    * LSH-blocked on the RHP signature to avoid the O(n²) cross join. */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 6): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", rhpSignature(col("v"), bits))
    val a = sig.select(col("id").as("id_a"), col("v").as("_va"), col("bucket"))
    val b = sig.select(col("id").as("id_b"), col("v").as("_vb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("_va"), col("_vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
