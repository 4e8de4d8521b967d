package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: language id, quality scoring,
 * token counting, and document fingerprinting. All pure Column expressions —
 * codegen-friendly, no UDFs, no state.
 */
object TextAnalysis {

  /** Tokens = maximal non-whitespace runs. Spark's `trim` strips U+0020 ONLY
    * and `split` keeps empty edge tokens, so the old trim+split counted
    * phantom tokens on text with leading/trailing \t or \n (most real web
    * text); dropping empties is exact for every whitespace shape. */
  private[operators] def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count (0 for blank OR null text — without the explicit
    * guard, legacy `spark.sql.legacy.sizeOfNull` sessions get size = -1). */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish subword count: word-boundary pieces + digit runs + punctuation singles.
    * Uses lookarounds (camelCase splits), so it has no RE2/DuckDB mirror —
    * sbt-verified; [[pieceCount]] is the driver-oracled variant. */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[a-z])(?=[A-Z])|\\s+|(?<=\\p{Punct})|(?=\\p{Punct})|(?<=\\d)(?=\\D)|(?<=\\D)(?=\\d)"),
      s => length(s) > 0))

  /** Tokenizer-piece count via plain alternation (letter runs, digit runs,
    * punctuation singles) — RE2-compatible, so DuckDB mirrors it exactly. The
    * whitespace class is spelled out because Java's \s includes vertical tab
    * (U+000B) while RE2's does not. */
  def pieceCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, "\\p{Punct}", ""))).cast("double") / total.cast("double"))
  }

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
    "it", "that", "this", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are English stopwords (quality / language
    * signal); 0.0 for blank or null text — a bare `=== 0` guard let legacy
    * `sizeOfNull` sessions evaluate (-1)/(-1) = 1.0, reporting an ABSENT
    * document as 100% stopwords (the strongest possible quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val sw = typedLit(stopwords)
    // filter, not array_intersect: the ratio needs the MULTISET count of
    // stopword tokens and array_intersect dedups
    when(text.isNull || size(toks) <= 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Mean word length (0 for blank or null text — see [[stopwordRatio]]). */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(text.isNull || size(toks) <= 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /**
   * Composite quality score in [0,1]: length band, moderate punctuation, presence of
   * stopwords, sane mean word length — the standard cheap web-text heuristics.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val swOk = when(stopwordRatio(text) > 0.05, 1.0).otherwise(0.0)
    val mwl = meanWordLen(text)
    val mwlOk = when(mwl >= 2.5 && mwl <= 12.0, 1.0).otherwise(0.0)
    // an ABSENT document scores 0, not 0.25: least(null, 1.0) skips nulls, so
    // the length component alone otherwise granted null text full credit
    when(text.isNull, lit(0.0)).otherwise((lenScore + punctOk + swOk + mwlOk) / 4.0)
  }

  /**
   * Language-id heuristic: CJK/Cyrillic/kana script detection by codepoint class,
   * then stopword votes for Latin-script languages. Returns a 2-letter code or 'und'.
   */
  def langIdHeuristic(text: Column): Column = {
    val t = lower(text)
    def frac(pattern: String): Column = {
      val total = greatest(length(text), lit(1))
      (length(text) - length(regexp_replace(text, pattern, ""))).cast("double") / total.cast("double")
    }
    def votes(words: Seq[String]): Column = {
      val toks = tokens(t)
      size(filter(toks, w => array_contains(typedLit(words), w)))
    }
    val enV = votes(Seq("the", "and", "of", "to", "is", "that", "for", "with"))
    val deV = votes(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))
    val frV = votes(Seq("le", "la", "les", "et", "est", "que", "des", "une"))
    val esV = votes(Seq("el", "la", "los", "las", "que", "es", "una", "por"))
    when(frac("[\\u3040-\\u30ff]") > 0.05, "ja")
      .when(frac("[\\u4e00-\\u9fff]") > 0.2, "zh")
      .when(frac("[\\u0400-\\u04ff]") > 0.2, "ru")
      .when(enV >= deV && enV >= frV && enV >= esV && enV > 0, "en")
      .when(deV >= frV && deV >= esV && deV > 0, "de")
      .when(frV >= esV && frV > 0, "fr")
      .when(esV > 0, "es")
      .otherwise("und")
  }

  /**
   * 64-bit document fingerprint: polynomial rolling hash of the normalized text
   * (lowercased, whitespace collapsed). Same content modulo spacing/casing ==
   * same fingerprint; implemented as xxhash64 of the normalized form (single pass,
   * collision-safe at corpus scale for dedup candidate keys).
   */
  def fingerprint(text: Column): Column =
    // edge-trim ALL whitespace (Spark trim is spaces-only — a trailing newline
    // previously changed the fingerprint of otherwise-identical content)
    xxhash64(regexp_replace(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+", " "))
}
