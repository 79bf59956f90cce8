package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization counts, quality scoring, language identification and
 * document fingerprinting. All are built from codegen'd built-in
 * functions (plus two native expressions) — per-row, no shuffles beyond
 * the final aggregate, so they scale linearly with executors at 100 TB.
 */
object TextOps {

  /** Whitespace tokens of `text`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish subword proxy: Σ over words of ceil(len/4). */
  def subwordCount(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, w) => acc + ceil(length(w) / 4.0).cast("long"))

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "be", "are", "was", "or")

  /** Ratio of stopword tokens among distinct tokens (0 when no tokens). */
  def stopwordRatio(c: Column, stops: Seq[String] = englishStopwords): Column = {
    val toks = tokens(c)
    when(size(toks) > 0,
      size(array_intersect(array_distinct(toks), lit(stops.toArray))) * 1.0 / size(toks))
      .otherwise(0.0)
  }

  /** Ratio of lowercase-letter characters. */
  def alphaRatio(text: Column, nChars: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")) * 1.0 / nChars

  /** Composite quality score in [0,1]: length, alpha ratio, mean word
    * length (heuristic quality scoring for corpus filtering). */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(nChars / 500.0, lit(1.0))
    val alpha = alphaRatio(text, nChars)
    val meanWord = when(size(toks) > 0, nChars * 1.0 / size(toks)).otherwise(0.0)
    val wordScore = when(meanWord.between(3, 12), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + alpha * 0.5 + wordScore * 0.2, 4)
  }

  /** Character n-gram / stopword profiles per language (public top-word
    * lists; discriminates real multilingual text). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "pas"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /**
   * Heuristic language ID: score = |distinct tokens ∩ profile| per
   * language, argmax wins (ties → lexicographically last language, fully
   * deterministic). Pure built-ins → codegen, no UDF.
   */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, lit(words.toArray))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** 64-bit SimHash over whitespace tokens (native expression). */
  def simhash(text: Column): Column = GraftFunctions.simhash64(tokens(text))

  /** Winnowing-style rolling-hash fingerprint (native expression). */
  def fingerprint(text: Column, k: Int = 16): Column =
    GraftFunctions.rollingFingerprint(text, k)

  // ---- DataFrame-level operators -----------------------------------------

  /** Per-language token statistics. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(size(tokens(col("text")))).as("toks"),
      round(avg(alphaRatio(col("text"), col("n_chars"))), 4).as("alpha_ratio"))
      .orderBy(col("lang"))

  /** Per-language quality profile. */
  def qualityStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      round(avg(stopwordRatio(col("text"))), 4).as("stop_ratio"),
      round(avg(qualityScore(col("text"), col("n_chars"))), 4).as("quality"))
      .orderBy(col("lang"))
}
