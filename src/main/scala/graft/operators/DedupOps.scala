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

  /** (id, hh) exploded 64-bit shingle hashes — ONE pass over the text via
    * the ShingleHashes codegen expression (the substr-per-window
    * formulation is O(len²) per document and shuffles string shingles). */
  private def explodedShingleHashes(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(graft.functions.ShingleHashes.shingleHashes(
        TextOps.normalize(col(textCol)), shingleN)).as("hh"))

  /** MinHash+LSH near-duplicate pairs (id_a < id_b) with an estimated
    * Jaccard (fraction of agreeing minhash components) ≥ `threshold`.
    *
    * Pipeline: explode shingle hashes → one hash-agg builds the
    * `numHashes` signature minima per doc (seed-mixed from the window
    * hash, no per-seed re-hash of text) → explode band keys → equi
    * self-join carrying IDS ONLY → distinct pairs → signatures re-joined
    * (broadcast) for the agreement estimate. Candidate pairs never drag
    * the signature arrays through the band-join shuffle.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 32, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    import graft.functions.ShingleHashes.seedMix
    val ex = explodedShingleHashes(df, idCol, textCol, shingleN)
    val sigs = ex.groupBy(col("id")).agg(
      array((0 until numHashes).map(seed => min(seedMix(col("hh"), seed))): _*).as("sig"))
    val bands = numHashes / rowsPerBand
    val banded = sigs.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("h"))
      }: _*)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("bk"))
    val pairs = a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / numHashes).as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
  }

  /** 64-bit SimHash per document: per-bit majority vote over shingle
    * hashes, ONE aggregation pass with 16 packed counters (4×16-bit
    * counts per long — 65,535-shingle docs max) instead of 64 separate
    * sums: 4× less aggregate state and far smaller generated code. */
  def simHashes(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5): DataFrame = {
    val ex = explodedShingleHashes(df, idCol, textCol, shingleN)
    // packed(c) accumulates bits c, c+16, c+32, c+48 in lanes 0..3
    val agg = ex.groupBy(col("id")).agg(
      count(lit(1)).as("n"),
      array((0 until 16).map { c =>
        sum((0 until 4).map { lane =>
          shiftleft(shiftright(col("hh"), c + 16 * lane).bitwiseAND(1), 16 * lane)
        }.reduce((x, y) => x.bitwiseOR(y))).as(s"p$c")
      }: _*).as("packed"))
    agg.select(col("id"),
      (0 until 64).map { bit =>
        val c = bit % 16; val lane = bit / 16
        val ones = shiftright(col("packed").getItem(c), 16 * lane).bitwiseAND(0xFFFFL)
        when(ones * 2 > col("n"), lit(1L << bit)).otherwise(lit(0L))
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
