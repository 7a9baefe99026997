package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Published rule-based corpus filters — the Gopher document-level rules
  * (Rae et al. 2021, table A1) and the C4 line-level cleaning rules
  * (Raffel et al. 2020, §2.2) — as pure column expressions.
  *
  * Everything here is a map-only codegen projection (no UDFs, no shuffle):
  * at 100 TB this pass runs at scan speed and its cost is the parquet
  * decode. All thresholds are applied in INTEGER cross-multiplied form
  * (`5*alpha_words >= 4*n_words` instead of `ratio >= 0.8`) so results
  * are bit-exact and engine-independent — the same discipline the oracle
  * replays in DuckDB.
  *
  * The reference has no text operators (it ships SQL strings only,
  * sqoop_table.py:125); these are north-star training-data additions.
  */
object RuleFilters {

  /** Gopher rule thresholds (public constants from the paper; word-count
    * band narrowed to the synthetic corpus' scale so both outcomes occur).
    */
  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3
  val MaxMeanWordLen = 10
  val MinStopwordHits = 2

  /** Per-document Gopher rule columns over whitespace-token text.
    * Returns (rule name → boolean column); `keep` is their conjunction.
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val toks = TextFunctions.tokens(text)
    val nWords = size(toks).cast("long")
    // chars in words = total chars minus the n-1 separators
    val wordChars = length(text).cast("long") - (nWords - lit(1L))
    // words containing at least one letter
    val alphaWords = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
    // '#' occurrences + '...' occurrences, counted by length deltas
    val hashSyms = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)
    val symbols = (hashSyms + ellipses).cast("long")
    val stopHits = TextFunctions
      .stopwordCount(text, TextFunctions.EnglishStopwords)
    Seq(
      "word_count_ok" ->
        (nWords >= lit(MinWords.toLong) && nWords <= lit(MaxWords.toLong)),
      // MinMeanWordLen <= wordChars/nWords <= MaxMeanWordLen, integer form
      "mean_word_len_ok" ->
        (wordChars >= lit(MinMeanWordLen.toLong) * nWords &&
          wordChars <= lit(MaxMeanWordLen.toLong) * nWords),
      // symbol-to-word ratio < 0.1  ⇔  10*symbols < nWords
      "symbol_ratio_ok" -> (symbols * lit(10L) < nWords),
      // >= 80% of words contain a letter  ⇔  5*alpha >= 4*n
      "alpha_ratio_ok" -> (alphaWords * lit(5L) >= nWords * lit(4L)),
      "stopwords_ok" -> (stopHits >= lit(MinStopwordHits.toLong)))
  }

  /** Project documents to per-rule booleans + the conjunction `keep`. */
  def gopher(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val rules = gopherRules(col(textCol))
    val keep = rules.map(_._2).reduce(_ && _)
    rules.foldLeft(docs) { case (d, (name, c)) => d.withColumn(name, c) }
      .withColumn("keep", keep)
  }

  /** C4 line-level cleaning over a page whose `lines` column is an array
    * of strings: keep lines that end in terminal punctuation, contain at
    * least `minLineWords` words, and are not bullet items; drop the whole
    * page if any line contains a blocklisted phrase or a curly brace.
    * Returns (kept-lines array column, page-drop boolean column).
    */
  val MinLineWords = 4
  val Blocklist: Seq[String] = Seq("lorem ipsum")

  def c4KeptLines(lines: Column): Column =
    filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(split(l, " ")) >= lit(MinLineWords) &&
        !l.startsWith("- "))

  def c4PageDrop(lines: Column): Column = {
    val joined = lower(concat_ws("\n", lines))
    Blocklist.map(p => joined.contains(p)).reduce(_ || _) ||
      joined.contains("{") || joined.contains("}")
  }
}
