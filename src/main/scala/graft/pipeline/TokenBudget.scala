package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-language token-budget sampling — the mixture-control step of a
  * training-data pipeline: each language gets a token budget, documents are
  * ranked by a deterministic content hash (layout- and partitioning-
  * independent), and whole documents are taken in hash order until the
  * budget is exhausted.
  *
  * Scale shape: one window per `lang` partition (a running sum over the
  * hash ordering) — partitioned work, no global window, no driver state.
  * At 100 TB the shuffle key is `lang` which is low-cardinality/skewed
  * (`en` dominates real corpora); for that case pre-aggregate per
  * (lang, doc) first — rows are already one-per-doc here — and if a single
  * language still exceeds one executor's share, split the ordering range by
  * hash prefix and prefix-sum the per-range totals (two bounded passes).
  * At the per-doc row widths involved (id + count, not text), a running
  * sum over even a trillion docs per language holds up; the text column is
  * never shuffled.
  */
object TokenBudget {

  /** Documents selected within each language's token budget.
    *
    * @param budgets  per-language token budgets; languages absent from the
    *                 map get `defaultBudget`
    * @return one row per selected doc: lang, rk (hash-order rank within
    *         lang), doc_id, n_tokens, cum_tokens (running total including
    *         this doc, ≤ the lang budget)
    */
  def sample(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long,
      tokenCount: Column => Column = TextFunctions.tokenCount): DataFrame = {
    val ord = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val budget: Column = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    docs
      .select(col("lang"), col("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Per-language accounting of a [[sample]] result: docs taken, tokens
    * used, and the budget-respected flag (trivially true by construction —
    * emitted so the invariant is part of the checked result).
    */
  def accounting(selected: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val budget: Column = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    selected.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), max(col("cum_tokens")).as("tokens_used"))
      .withColumn("within_budget", col("tokens_used") <= budget)
      .select(col("lang"), col("n_docs"), col("tokens_used"),
        col("within_budget"))
  }
}
