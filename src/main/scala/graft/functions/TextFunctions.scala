package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (builder brief: language-ID, quality scoring, token counting,
  * fingerprinting). Everything is composed from codegen'd built-ins —
  * no UDFs — so these run inside whole-stage codegen at any scale.
  */
object TextFunctions {

  /** Space-tokenize, dropping empty tokens (multiple/leading spaces).
    * Deliberately simple & oracle-reproducible; `wsTokens` handles
    * arbitrary whitespace.
    */
  def tokens(text: Column): Column =
    filter(split(text, " ", -1), t => t =!= lit(""))

  /** Tokenize on any whitespace run. */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+", -1), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: letter runs, digit runs, and
    * single non-alphanumeric marks — the GPT-2-style pre-tokenizer
    * shape, kept regex-simple so engines agree.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Cleaning pass for corpus prep: strip URLs and e-mail addresses,
    * collapse whitespace runs, trim. Regexes stay in the common
    * Java-regex/RE2 subset so any SQL engine reproduces the result.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://\\S+", " "),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", " "),
      "\\s+", " "))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()]", ""))

  /** Mean token length in characters (0.0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
        .cast("double") / size(t).cast("double"))
  }

  /** Tiny multilingual stopword profiles for the heuristic scorer.
    * Deliberately small: the point is the distributed scoring shape,
    * not lexicographic completeness.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"))

  def stopwordCount(text: Column, lang: String = "en"): Column = {
    val words = stopwordProfiles(lang)
    size(filter(tokens(lower(text)), t =>
      array_contains(lit(words.toArray), t)))
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0)
      .otherwise(stopwordCount(text, lang).cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: length band + stopword
    * presence + punctuation sanity + mean-token-length band. The
    * classic cheap pre-filter for LLM corpus cleaning (C4-style
    * heuristics), expressed as one codegen'd expression tree.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val lenScore = least(nChars / 200.0, lit(1.0)) *
      when(nChars > 20000, 0.5).otherwise(1.0)
    val swScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(nChars, lit(1.0))
    val punctScore = when(punctRatio > 0.3, 0.2).otherwise(1.0)
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(2.5, 12.0), 1.0).otherwise(0.4)
    round(lenScore * 0.3 + swScore * 0.3 + punctScore * 0.2 + mtlScore * 0.2, 6)
  }

  /** Charset+stopword language-ID heuristic. Charset beacons decide
    * CJK/Cyrillic/Arabic outright; otherwise the stopword-profile
    * argmax decides among Latin-script languages, ties broken
    * lexicographically (deterministic), 'und' when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(array_distinct(toks), lit(words.toArray))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(text.rlike("[\\u3040-\\u30ff]"), "ja")
      .when(text.rlike("[\\uac00-\\ud7af]"), "ko")
      .when(text.rlike("[\\u0400-\\u04ff]"), "ru")
      .when(text.rlike("[\\u0600-\\u06ff]"), "ar")
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** Canonical document fingerprint: md5 of case-folded,
    * whitespace-collapsed text. Stable across engines (md5 is md5),
    * used by exact dedup.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** The fingerprint's pre-hash form (case-folded, whitespace-
    * collapsed) — the canonical text for character-level comparisons
    * (edit-distance kernels) that must agree with [[fingerprint]].
    */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Word n-gram shingles as strings ("a b c"), document order,
    * duplicates preserved; empty array when the doc has fewer than n
    * tokens. Native expression — the obvious HOF composition
    * (`transform(sequence, i -> concat_ws(slice(tokens(text), ...)))`)
    * re-evaluates the tokenize subtree once per output element (HOF
    * lambdas bind expression TREES, not computed values), i.e. an
    * O(tokens^2) split per document: measured 15 s for a corpus pass
    * that the native form does in under a second.
    */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.expressions.word_shingles(text, n)

  /** Rolling polynomial hash of the whole document (base-31 over
    * chars, mod the Mersenne-ish prime 2^31-1 so the accumulator
    * never overflows Long under ANSI mode) — an order-sensitive
    * fingerprint: permuted tokens hash differently even though the
    * token SET (and thus minhash) is unchanged.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, "", -1), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(2147483647L)))
}
