package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All pure Catalyst expressions (regexp/string built-ins) — codegen'd,
  * no UDFs, so they survive whole-stage codegen and predicate pushdown at
  * 100 TB scale. Regexes are RE2-compatible so the DuckDB oracle can run
  * the identical pattern.
  */
object TextOps {

  /** Whitespace-token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Normalized form used for exact-dup fingerprinting: lowercase,
    * whitespace runs collapsed to single spaces, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 128-bit content fingerprint of the normalized text (hex string). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Count of characters matching a character-class regex. */
  def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  /** Quality-signal columns: raw integer counts (deterministic across
    * engines — ratios are left to the consumer). */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct", charClassCount(t, "[^\\p{Punct}]"))
      .withColumn("n_digits", charClassCount(t, "[^0-9]"))
      .withColumn("n_upper", charClassCount(t, "[^A-Z]"))
  }

  /** Tiny English-stopword list used by the language-ID heuristic. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")

  /** Case-insensitive whole-word stopword hits in the text. */
  def stopwordHits(text: Column): Column = {
    val pat = EnglishStopwords.mkString("(?i)\\b(", "|", ")\\b")
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** BPE-style pre-tokenizer piece count: GPT-2-ish segmentation
    * (contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, whitespace runs). RE2-compatible (no lookarounds)
    * so the DuckDB oracle runs the identical pattern. */
  val BpePattern: String =
    """'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"""

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** N-gram-free language-ID heuristic: 'en' when stopword density over
    * tokens exceeds `minDensityPct` percent, else 'other'. Integer
    * arithmetic only (100*hits >= pct*tokens) for cross-engine parity. */
  def langIdHeuristic(text: Column, minDensityPct: Int = 8): Column =
    when(tokenCount(text) > 0 &&
         stopwordHits(text) * 100 >= tokenCount(text) * minDensityPct, lit("en"))
      .otherwise(lit("other"))

  /** Word-bigram array of a document (lowercased `[a-z0-9]+` word
    * tokens): one zip_with pass over the token array; < 2 tokens →
    * empty. */
  def wordBigrams(text: Column): Column = {
    val w = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus-LM quality signal with integer-exact cross-engine semantics:
    * per document, the total bigram count and how many of its bigram
    * OCCURRENCES are corpus-rare (corpus frequency < `minCount`) — the
    * rare-n-gram rate used as a perplexity proxy in training-data
    * quality filters (a doc whose bigrams the corpus has never seen
    * again is boilerplate-free but also likely noise; a doc of only
    * corpus-common bigrams is likely template spam). All counts are
    * integers, so the DuckDB oracle is value-exact — no float log-prob
    * portability trap.
    *
    * Scale shape: explode → one hash-agg for the corpus bigram
    * vocabulary → shuffle equi-join occurrences×vocabulary (AQE handles
    * the skewed head: common bigrams are heavy on the build side but
    * the join key distributes) → per-doc partial agg. Docs with < 2
    * tokens survive via the final left join. */
  def rareBigramStats(df: DataFrame, idCol: String, textCol: String,
      minCount: Int = 2): DataFrame = {
    val bg = df.select(col(idCol).as("doc_id"),
        explode(wordBigrams(col(textCol))).as("bg"))
    val vocab = bg.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val perDoc = bg.join(vocab, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") < minCount, 1L).otherwise(0L)).as("n_rare"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
  }
}
