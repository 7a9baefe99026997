package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** The composed training-data preparation flow — what a user of this engine
  * actually runs over 100 TB of raw documents:
  *
  *   quality filter → exact dedup (keep canonical doc) → language routing →
  *   partitioned columnar output.
  *
  * Every stage is a DataFrame transform from the operator library; the whole
  * flow is one shuffle (the dedup aggregate) plus the write. Output is
  * partitioned by language so downstream per-language training jobs
  * partition-prune their scans.
  */
object TrainingDataPipeline {

  /** Quality gate: keep docs labeled "ok" by the cheap heuristics. */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs.filter(TextFunctions.qualityLabel(col("text")) === "ok")

  /** Exact dedup keeping the lowest doc_id per identical text (joins the
    * canonical ids back to recover full rows). Fingerprint-keyed: the
    * aggregate shuffles only (hash, id) pairs, never document bodies.
    */
  def dedupKeepCanonical(docs: DataFrame): DataFrame = {
    val canon = Dedup.exactByFingerprint(docs)
      .select(col("canonical_id").as("doc_id"))
    docs.join(canon, "doc_id")
  }

  /** Full flow to a partitioned parquet layout. */
  def run(docs: DataFrame, outDir: String): Unit =
    dedupKeepCanonical(qualityFilter(docs))
      .write.mode("overwrite")
      .partitionBy("lang")
      .parquet(outDir)

  /** Per-language accounting of the surviving corpus (the oracle-checkable
    * summary of the whole flow).
    */
  def summary(docs: DataFrame): DataFrame =
    dedupKeepCanonical(qualityFilter(docs))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      .orderBy("lang")

  /** NEAR-dup canonicalization stage: cluster the survivors via blocked
    * n-gram Jaccard pairs + connected components, keep only each cluster's
    * minimum doc_id (docs in no pair keep themselves). All building blocks
    * are the scale-shaped operators: blocked pair join, adaptive CC, an
    * anti join on the drop list.
    */
  def dedupNearKeepCanonical(docs: DataFrame,
      threshold: Double = 0.6): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold)
    val cc = graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
    val drop = cc.filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** v2 summary: quality → exact dedup → near-dup clustering → accounting —
    * the full canonicalization a training corpus actually gets.
    */
  def summaryV2(docs: DataFrame): DataFrame =
    dedupNearKeepCanonical(dedupKeepCanonical(qualityFilter(docs)))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      .orderBy("lang")

  /** v3: the LEARNED-model flow — hashed-linear classifier gate
    * (graft.quality.LinearScorer) → exact dedup → per-language SUBWORD
    * token budget (costs counted in subword pieces via the codegen
    * tokenizer, the unit an LLM actually trains on). Shuffle profile:
    * dedup aggregate + one per-lang window; classifier and tokenizer are
    * map-only codegen stages.
    */
  def summaryV3(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.graftx.WordPiece.subword_pieces
    val gated = docs.filter(graft.quality.LinearScorer.score(col("text")) > 0)
    val canon = dedupKeepCanonical(gated)
    val sel = TokenBudget.sample(canon, budgets, defaultBudget,
      t => size(subword_pieces(t)).cast("long"))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    sel.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("cum_tokens")).as("pieces_used"),
        expr("bit_xor(doc_id)").as("id_xor"))
      .withColumn("within_budget", col("pieces_used") <= budget)
      .orderBy("lang")
  }

  /** v4: the CORPUS-RELEASE flow — published Gopher rule gate
    * ([[graft.quality.RuleFilters]]) → exact dedup → per-language token
    * budget → `.jsonl.zst` shard export — with the accounting computed
    * from the READ-BACK shards, so the summary proves the released bytes,
    * not the pre-export DataFrame. Shuffle profile: dedup aggregate + one
    * per-lang window + the shard repartition; the gate is a map-only
    * integer-rule projection.
    */
  def summaryV4(docs: DataFrame, outDir: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.graftx.RollingHash.rolling_hash
    val gated = graft.quality.RuleFilters
      .gopher(docs.select(col("doc_id"), col("lang"), col("text")))
      .filter(col("keep"))
      .select(col("doc_id"), col("lang"), col("text"))
    val canon = dedupKeepCanonical(gated)
    val sel = TokenBudget.sample(canon, budgets, defaultBudget)
    val released = canon.join(sel.select("doc_id"), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
    graft.sources.Sources.jsonlZstWrite(released, outDir, numShards = 4)
    graft.sources.Sources.jsonlZst(docs.sparkSession, outDir, released.schema)
      .select(col("lang"), col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_toks"),
        rolling_hash(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        expr("bit_xor(doc_id)").as("id_xor"),
        expr("bit_xor(fp)").as("text_xor"))
      .orderBy("lang")
  }
}
