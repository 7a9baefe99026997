package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline.
  *
  * All of these are pure `org.apache.spark.sql.functions` compositions —
  * codegen'd, no UDFs, so they stay inside whole-stage codegen and scale
  * linearly with input size (no shuffle, no driver involvement). The
  * reference has no text operators (it only ships SQL strings,
  * `sqoop_table.py:125` is its only string function); these are the
  * north-star training-data-pipeline additions.
  */
object TextFunctions {

  /** Whitespace tokens. Single-space split for cross-engine parity
    * (DuckDB `string_split(text, ' ')` has identical semantics).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: runs of lowercase letters, digits, or a
    * single non-space symbol. Approximates a byte-pair tokenizer's word-piece
    * budget without a vocab file.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Number of tokens that appear in `stopwords`. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val set = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t))).cast("long")
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Stopword ratio in [0,1]; integer/integer division in double — exact and
    * engine-independent.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text).cast("double")

  /** Mean token length = (chars - separators) / tokens, in double. */
  def avgTokenLength(text: Column): Column =
    (length(text).cast("double") - (tokenCount(text) - lit(1)).cast("double")) /
      tokenCount(text).cast("double")

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Composite quality label from cheap heuristics: length band, lexical
    * diversity, stopword presence. Thresholds are arbitrary but deterministic.
    */
  def qualityLabel(text: Column): Column =
    when(tokenCount(text) < 5, lit("too_short"))
      .when(typeTokenRatio(text) < lit(0.3), lit("repetitive"))
      .when(stopwordRatio(text) > lit(0.5), lit("boilerplate"))
      .otherwise(lit("ok"))

  /** Language-ID marker words. With real corpora these would be per-language
    * stopword lists; the synthetic `documents` table shares one vocabulary, so
    * the lists just have to be deterministic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "fast", "slow", "small"),
    "es" -> Seq("data", "vector", "line"),
    "de" -> Seq("hash", "merge", "stream"),
    "fr" -> Seq("table", "column", "row"),
    "zh" -> Seq("scan", "join", "group"))

  /** N-gram-heuristic language ID: count marker hits per language, take the
    * argmax with first-listed language winning ties. Pure column expressions →
    * whole-stage codegen; at 100 TB this is a map-only pass.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      val set = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(set, t)))
    }
    // argmax with ties resolved by list order: lang i wins iff its score is
    // strictly greater than every earlier score and >= every later score.
    val best = scores.zipWithIndex.foldLeft(lit("unk")) { case (acc, ((lang, s), i)) =>
      val beatsEarlier = scores.take(i).map { case (_, s2) => s > s2 }
        .foldLeft(lit(true))(_ && _)
      val tiesLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
        .foldLeft(lit(true))(_ && _)
      when(beatsEarlier && tiesLater && s > lit(0), lit(lang)).otherwise(acc)
    }
    best
  }

  /** Canonicalization for near-exact dedup: lowercase, non-alphanumerics to
    * spaces, whitespace runs collapsed, trimmed. Catches the trivial-variant
    * duplicates (case, punctuation, spacing) exact dedup misses, at map
    * speed — regexes are codegen'd, no UDF.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Character shingles (n-grams) of length n, distinct, for Jaccard/MinHash.
    * `sequence` + `transform` keeps it codegen-friendly (no UDF, no explode).
    */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
        i => text.substr(i, lit(n))))

  /** Word n-gram shingles (distinct), the unit for MinHash / Jaccard dedup. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - lit(n), lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** Jaccard similarity of the distinct-token sets of two texts. Exact
    * int/int division in double.
    */
  def tokenJaccard(a: Column, b: Column): Column = {
    val sa = array_distinct(tokens(a))
    val sb = array_distinct(tokens(b))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Jaccard over word n-gram shingle sets — the same unit the MinHash
    * sketch approximates (order-sensitive, unlike [[tokenJaccard]]).
    */
  def shingleJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = wordShingles(a, n)
    val sb = wordShingles(b, n)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Luhn mod-10 check over a fixed-length digit string — what separates a
    * card number from 16 random digits, so a PII scrubber masks real-shaped
    * numbers instead of every long numeral (order ids, ISBNs). Pure
    * integer column arithmetic: double every second digit from the right,
    * fold the digit sum, test mod 10.
    */
  def luhnValid(card: Column, len: Int = 16): Column = {
    val digitSum = aggregate(
      transform(sequence(lit(1), lit(len)), i => {
        val d = card.substr(i, lit(1)).cast("int")
        val dbl = when((lit(len + 1) - i) % 2 === 0, d * 2).otherwise(d)
        when(dbl > 9, dbl - 9).otherwise(dbl)
      }),
      lit(0), (acc, x) => acc + x)
    digitSum % 10 === 0
  }

  /** Mask every Luhn-VALID 16-digit run in `text` (invalid runs stay — the
    * false-positive guard real scrubbers need); returns the masked text.
    * Extraction + validation + replacement are all array higher-order
    * functions over the few matches per document — per-row work, map-only.
    */
  def scrubCards(text: Column): Column = {
    val cards = filter(
      regexp_extract_all(text, lit("\\b[0-9]{16}\\b"), lit(0)),
      c => luhnValid(c))
    aggregate(cards, text,
      (acc, c) => replace(acc, c, lit("#" * 16)))
  }
}
