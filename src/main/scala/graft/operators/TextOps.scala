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
}
