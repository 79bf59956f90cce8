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
  // Shadows functions.md5 with the thread-local-digest variant (identical
  // hex output; Spark's Md5 builds a MessageDigest per row via provider
  // reflection, which degrades badly in long-lived sessions).
  private def md5(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.md5(c)


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

  /** Ratio of lowercase-letter characters. Native byte-scan expression —
    * oracle-equivalent to `length(regexp_replace(text,'[^a-z]',''))` but
    * zero-allocation (the regexp form copies every string through
    * java.util.regex per row; it was 25% of the x30 bench wall). */
  def alphaRatio(text: Column, nChars: Column): Column =
    GraftFunctions.lowerAlphaCount(text) * 1.0 / nChars

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

  /** 64-bit SimHash over whitespace tokens (native expression; FNV-1a —
    * the fastest scale path, not oracle-reproducible). */
  /** PII scrubbing patterns a training-data pipeline redacts before
    * publishing a corpus. Deliberately dialect-portable regexes (no
    * lookaround, no shorthand classes that differ between engines) so
    * the DuckDB oracle can apply the identical patterns. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** Redact emails/phones/SSNs; entirely codegen'd regexp_replace — the
    * scan-local shape that costs one pass at 100 TB, no shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, SsnRe, "[SSN]"),
        PhoneRe, "[PHONE]"),
      EmailRe, "[EMAIL]")

  def simhash(text: Column): Column = GraftFunctions.simhash64(tokens(text))

  /** Winnowing-style rolling-hash fingerprint (native expression). */
  def fingerprint(text: Column, k: Int = 16): Column =
    GraftFunctions.rollingFingerprint(text, k)

  // ---- md5-based (engine-portable) variants ------------------------------
  // Same algorithms keyed on md5 instead of FNV/xxhash, so any engine with
  // md5() reproduces them bit-for-bit (the DuckDB oracle does). md5 is
  // ~2-3x the cost of xxhash64 per token — negligible against the scan.

  /** Value 0-15 of the 1-based `i`-th hex char of an md5-hex column. */
  private[pipeline] def hexNibble(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** Min-md5 document fingerprint over sliding `k`-char windows
    * (winnowing-style): equal fingerprints ⇒ shared k-gram. Per-row,
    * shuffle-free, codegen'd built-ins only. */
  def fingerprintMd5(text: Column, k: Int = 16): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  /**
   * 64-bit SimHash rendered as 16 hex chars, from md5 token hashes:
   * bit b of a token = (nibble(b/4) >> (b%4)) & 1 where nibble(i) is the
   * value of hex char i+1 of md5(token); signature bit b is set iff more
   * than half the tokens (with multiplicity) have bit b set.
   *
   * One doc_id-keyed aggregation (map-side combined) — linear at corpus
   * scale. Returns (idAlias, shAlias).
   */
  def simhashHexAgg(df: DataFrame, id: Column, text: Column,
      idAlias: String = "doc_id", shAlias: String = "sh"): DataFrame = {
    val tok = df.select(id.as(idAlias), explode(tokens(text)).as("__w"))
      .select(col(idAlias), md5(col("__w")).as("__h"))
    val nib = tok.select(
      col(idAlias) +: (0 until 16).map(i => hexNibble(col("__h"), i + 1).as(s"__v$i")): _*)
    val aggs = count(lit(1)).as("__n") +: (0 until 64).map(b =>
      sum(shiftright(col(s"__v${b / 4}"), b % 4).bitwiseAND(lit(1))).as(s"__b$b"))
    val acc = nib.groupBy(col(idAlias)).agg(aggs.head, aggs.tail: _*)
    val sigChars = (0 until 16).map { i =>
      val v = (0 until 4).map(j =>
        when(col(s"__b${4 * i + j}") * 2 > col("__n"), lit(1 << j)).otherwise(lit(0)))
        .reduce(_ + _)
      lit("0123456789abcdef").substr(v + 1, lit(1))
    }
    acc.select(col(idAlias), concat(sigChars: _*).as(shAlias))
  }

  /** Hamming distance between two 16-hex-char simhash signatures. */
  def hammingHex(a: Column, b: Column): Column =
    (1 to 16).map(i =>
      bit_count(hexNibble(a, i).bitwiseXOR(hexNibble(b, i)))).reduce(_ + _).cast("long")

  // ---- DataFrame-level operators -----------------------------------------

  /** Per-language token statistics. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(size(tokens(col("text")))).as("toks"),
      round(avg(alphaRatio(col("text"), col("n_chars"))), 4).as("alpha_ratio"))
      .orderBy(col("lang"))

  /** Corpus vocabulary: top-`k` lowercase whitespace tokens by frequency
    * (ties broken by token, fully deterministic). One map-side-combined
    * token aggregate + a TakeOrdered(k) — no full sort, linear at corpus
    * scale; the classic first step of tokenizer/vocab training. */
  def vocabTopK(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(explode(tokens(lower(col("text")))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)

  /**
   * TF-IDF: top-`topPerDoc` tokens per document by tf·ln(N/df).
   *
   * The emitted score is quantized to an integer
   * (`floor(tf * ln(N/df) * 100)`) so ranking and comparison are
   * engine-portable — raw doubles differ in the last ulp between libm
   * implementations, which would make cross-engine rank order flaky.
   *
   * Shuffle profile at 100 TB: one (doc,token) aggregate, one token-level
   * document-frequency aggregate (vocab-sized — orders smaller than the
   * corpus), one join on token (AQE broadcasts when the vocab side fits),
   * one per-doc top-k via ranked window. N (corpus size) is a single
   * driver scalar.
   */
  def tfIdfTopK(docs: DataFrame, topPerDoc: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    val tok = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("token"))
      .where(length(col("token")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df_ = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df_, "token")
      .withColumn("score",
        floor(col("tf") * log(lit(n.toDouble) / col("df")) * 100).cast("long"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))))
      .where(col("rk") <= topPerDoc)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("token"), col("score"))
  }

  /** Per-language quality profile. */
  def qualityStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      round(avg(stopwordRatio(col("text"))), 4).as("stop_ratio"),
      round(avg(qualityScore(col("text"), col("n_chars"))), 4).as("quality"))
      .orderBy(col("lang"))
}
