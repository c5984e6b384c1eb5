package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All of these are pure column expressions (whole-stage codegen, no UDF,
  * no shuffle) — at 100 TB they run at parquet-scan speed.
  *
  * Every function has an exact DuckDB-SQL twin (see SparkEntry.oracleSql)
  * so the correctness gate covers them. */
object TextFunctions {

  /** Whitespace-token count. */
  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+"))

  /** Word (alphabetic run) count. */
  def wordCount(c: Column): Column = regexp_count(c, lit("[A-Za-z]+"))

  /** ASCII punctuation character count. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[!-/:-@\\[-`{-~]"))

  def digitCount(c: Column): Column = regexp_count(c, lit("[0-9]"))

  /** English stopword hit count (word-boundary anchored). */
  val EnStop = Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
  def stopwordCount(c: Column): Column =
    regexp_count(c, lit("\\b(" + EnStop.mkString("|") + ")\\b"))

  /** Heuristic quality score in [0,1]: blends length, punctuation ratio and
    * stopword density (the shape of a classic C4/CCNet-style filter). */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val toks = tokenCount(c).cast("double")
    val punct = punctCount(c).cast("double")
    val stop = stopwordCount(c).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val punctPenalty = least(punct / greatest(len, lit(1.0)) * lit(10.0), lit(1.0))
    val stopScore = least(stop / greatest(toks, lit(1.0)) * lit(5.0), lit(1.0))
    round((lenScore * lit(0.4) + (lit(1.0) - punctPenalty) * lit(0.2) +
      stopScore * lit(0.4)), 6)
  }

  /** Mean token length (chars per whitespace token). */
  def meanTokenLength(c: Column): Column =
    (length(c) - regexp_count(c, lit("\\s"))).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /** n-gram-profile language id heuristic: counts of language-marker words;
    * deterministic argmax with fixed tie order (en > fr > de > es > zh). */
  def langIdGuess(c: Column): Column = {
    val en = regexp_count(c, lit("\\b(the|and|of|is|with)\\b"))
    val fr = regexp_count(c, lit("\\b(le|la|les|et|des|une)\\b"))
    val de = regexp_count(c, lit("\\b(der|die|das|und|ist|ein)\\b"))
    val es = regexp_count(c, lit("\\b(el|los|las|y|una|es)\\b"))
    val zh = regexp_count(c, lit("[\\u4e00-\\u9fff]"))
    when(en >= fr && en >= de && en >= es && en >= zh, "en")
      .when(fr >= de && fr >= es && fr >= zh, "fr")
      .when(de >= es && de >= zh, "de")
      .when(es >= zh, "es")
      .otherwise("zh")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text —
    * the exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), lit("\\s+"), lit(" "))).cast("binary"))

  /** Character n-gram (shingle) array; positions 1..len-n+1. Documents
    * shorter than n yield an empty array. Native codegen expression —
    * the old `transform(sequence(...), substr)` HOF formulation was
    * interpreted per position (round-7 profile: seconds per sweep on the
    * dedup hot paths); output is value-identical. */
  def shingles(c: Column, n: Int): Column = graft.functions.Shingles.chars(c, n)

  /** Word n-gram array from whitespace tokens (split(trim(c), "\\s+"),
    * n-token windows joined with a single space); empty when fewer than
    * n tokens. Native codegen expression — value-identical to the old
    * HOF formulation, minus its interpreted per-position cost. */
  def wordShingles(c: Column, n: Int): Column = graft.functions.Shingles.words(c, n)

  /** Within-document repetition signals (the Gopher-rules quality-filter
    * family every LLM training pipeline applies; no reference
    * counterpart — LLM-pipeline extension surface): fraction of duplicate
    * lines, duplicate word 2-grams, and duplicate character 5-grams.
    * Pure codegen column math (split / array_distinct / size) — per-row,
    * no shuffle, no UDF; the fractions are exact and SQL-twinnable. */
  def dupLineFrac(c: Column): Column = {
    val lines = split(c, "\n")
    lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
  }

  def dupNgramFrac(c: Column, n: Int): Column = {
    val sh = shingles(c, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
      .otherwise(lit(0.0))
  }

  def dupWordNgramFrac(c: Column, n: Int): Column = {
    val sh = wordShingles(c, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
      .otherwise(lit(0.0))
  }

  /** Fraction of whitespace tokens containing at least one alphabetic
    * character (the Gopher "80% of words must contain an alphabetic
    * character" signal). Pure array math — no shuffle, no UDF. */
  def alphaTokenFrac(c: Column): Column = {
    val toks = split(trim(c), "\\s+")
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Gopher-rules document-level quality GATE (Rae et al. 2021 §A1.1
    * adapted to doc granularity): hard accept/reject with the FIRST
    * failing rule named, which is what a production pipeline logs for
    * filter-rate monitoring. Complements `qualityScore` (a soft score)
    * and the repetition fractions (`dupNgramFrac` family).
    *
    * Rule order is part of the contract (first-fail wins):
    * too_few_words < too_many_words < short_words < long_words <
    * nonalpha < no_stopwords < pass.
    *
    * Returns (n_words, mean_word_len, alpha_frac, n_stop, keep, reason)
    * as a struct; all comparisons run on the unrounded doubles so the
    * DuckDB twin — evaluating the identical IEEE-754 expressions —
    * makes the identical decisions. */
  def gopherGate(c: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minAlphaFrac: Double = 0.8, minStop: Int = 2): Column = {
    val nWords = tokenCount(c)
    val meanLen = meanTokenLength(c)
    val alphaFrac = alphaTokenFrac(c)
    val nStop = stopwordCount(c)
    val reason =
      when(nWords < minWords, "too_few_words")
        .when(nWords > maxWords, "too_many_words")
        .when(meanLen < minMeanLen, "short_words")
        .when(meanLen > maxMeanLen, "long_words")
        .when(alphaFrac < minAlphaFrac, "nonalpha")
        .when(nStop < minStop, "no_stopwords")
        .otherwise("pass")
    struct(
      nWords.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaFrac, 4).as("alpha_frac"),
      nStop.cast("long").as("n_stop"),
      (reason === "pass").cast("int").as("keep"),
      reason.as("reason"))
  }
}
