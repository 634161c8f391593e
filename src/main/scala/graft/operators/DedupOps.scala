package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes:
  *  - exact dedup = one hash aggregate on the fingerprint (partial agg →
  *    skew-proof, single shuffle);
  *  - MinHash/SimHash pipelines explode shingles to rows ONCE and build
  *    signatures with hash aggregates, so the shingle-generation
  *    expression is evaluated exactly once per document (a naive
  *    `transform`-per-seed formulation gets inlined by Catalyst's
  *    CollapseProject and recomputes the shingle array per seed — 30×
  *    slower measured at sf0.001);
  *  - candidate pairs come from equi self-joins on short band/chunk keys —
  *    never an O(n²) cross join; only candidate pairs are materialized.
  */
object DedupOps {

  /** Exact dedup on normalized-text fingerprint: keeps the smallest id per
    * duplicate group and reports group size. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextOps.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Character shingles (n-grams) of the normalized text, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val norm = TextOps.normalize(text)
    when(length(norm) >= n,
      array_distinct(
        transform(sequence(lit(1), length(norm) - (n - 1)),
          i => norm.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** (id, shingle) exploded rows — the one-pass base for signature aggs. */
  private def explodedShingles(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleN)).as("sh"))

  /** MinHash+LSH near-duplicate pairs (id_a < id_b) with an estimated
    * Jaccard (fraction of agreeing minhash components) ≥ `threshold`.
    *
    * Pipeline: explode shingles → one hash-agg builds the `numHashes`
    * signature minima per doc → explode band keys → equi self-join on
    * (band, bandHash) → distinct pairs → signature-agreement estimate.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 32, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val ex = explodedShingles(df, idCol, textCol, shingleN)
    val sigs = ex.groupBy(col("id")).agg(
      array((0 until numHashes).map(seed => min(xxhash64(col("sh"), lit(seed)))): _*).as("sig"))
    val bands = numHashes / rowsPerBand
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("h"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
  }

  /** 64-bit SimHash per document: per-bit majority vote over shingle
    * hashes, computed as 64 conditional-count aggregates in ONE pass. */
  def simHashes(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5): DataFrame = {
    val ex = explodedShingles(df, idCol, textCol, shingleN)
      .withColumn("hh", xxhash64(col("sh")))
    val agg = ex.groupBy(col("id")).agg(
      count(lit(1)).as("n"),
      array((0 until 64).map { bit =>
        sum(shiftright(col("hh"), bit).bitwiseAND(1))
      }: _*).as("ones"))
    agg.select(col("id"),
      (0 until 64).map { bit =>
        when(col("ones").getItem(bit) * 2 > col("n"), lit(1L << bit)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y)).as("h"))
  }

  /** SimHash near-dup candidates: docs whose 64-bit simhash differ by at
    * most `maxHamming` bits, candidate-blocked on 16-bit simhash chunks
    * (pigeonhole: ≤3 differing bits ⇒ at least one identical chunk). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, maxHamming: Int = 3): DataFrame = {
    val withH = simHashes(df, idCol, textCol, shingleN)
    val chunked = withH.select(col("id"), col("h"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"),
          shiftright(col("h"), c * 16).bitwiseAND(0xFFFFL).as("v"))
      }: _*)).as("chunk"))
    val a = chunked.select(col("id").as("id_a"), col("h").as("h_a"), col("chunk"))
    val b = chunked.select(col("id").as("id_b"), col("h").as("h_b"), col("chunk"))
    a.join(b, Seq("chunk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
