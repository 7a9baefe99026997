package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical ranking (BM25 over the inverted index,
  * [[graft.functions.Bm25]]) with a dense ranking (embedding cosine,
  * [[Similarity]]) by Reciprocal Rank Fusion — `Σ 1/(k + rank)` over the
  * retrievers that returned the document (Cormack et al. 2009, the
  * standard RAG-serving combiner, k=60).
  *
  * RRF terms are integerized as `floor(SCALE / (k + rank))` so the fused
  * score is an exact long — bit-identical across engines and partitionings
  * (the repo's integer-micro discipline; ranks themselves are exact, so
  * nothing is lost).
  *
  * Scale shape: each retriever reduces the corpus to its own top-k FIRST —
  * `orderBy(...).limit(k)` plans as TakeOrderedAndProject (per-partition
  * heaps, no global sort) — and only the two ≤k-row rank lists are joined
  * and fused. The 100 TB cost is the retrievers'; fusion is constant-sized.
  */
object HybridRetrieval {

  val RrfK = 60L

  /** Integerization scale: floor(1e9/(60+r)) keeps ~7 significant digits
    * of the fraction — far beyond what rank fusion distinguishes.
    */
  val RrfScale = 1000000000L

  /** Top `k` of a scored relation as (id, rank) with rank 1..k by
    * (score desc, id). The global row_number window runs AFTER the limit,
    * over ≤k rows (bounded by construction — see CatalogPlanSweepSpec
    * allowlist discipline).
    */
  def topRanks(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame =
    scored.select(col(idCol), col(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol)).limit(k)
      .select(col(idCol),
        row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
          .cast("long").as("rank"))

  /** Fuse two rank lists (id, rank) by RRF; a doc absent from one list
    * contributes only the other's term (full-outer semantics). Returns the
    * fused top `topK` as (id, r_a, r_b, rrf_u) ordered by (rrf_u desc, id).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      topK: Int): DataFrame = {
    val an = a.withColumnRenamed("rank", "r_a")
    val bn = b.withColumnRenamed("rank", "r_b")
    an.join(bn, Seq(idCol), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"$RrfScale div ($RrfK + r_a)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + r_b)"), lit(0L)))
      .orderBy(col("rrf_u").desc, col(idCol)).limit(topK)
  }
}

/** Offline retrieval-quality metrics over DETERMINISTIC rankings —
  * recall@k, reciprocal rank, nDCG@10 — in exact integer form so the
  * numbers are engine-reproducible (the evaluation half every retrieval
  * pipeline ships next to the index build).
  *
  * nDCG's per-position discount `1/log2(i+1)` is pre-quantized ONCE in
  * Scala to micro-int weights shared with the oracle SQL as literals, so
  * no runtime transcendental enters either engine: DCG sums are exact
  * longs, nDCG an integer division against the constant ideal.
  */
object RetrievalEval {

  /** round(1e6 / log2(i+1)) for positions i = 1..10. */
  val DcgWeightsMicro: Seq[Long] = (1 to 10).map(i =>
    math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** Ideal DCG for graded relevance 20,19,…,11 at positions 1..10 (ground
    * truth = top-20 list, rel(doc) = 21 - gt_rank).
    */
  val IdcgMicro: Long =
    DcgWeightsMicro.zipWithIndex.map { case (w, i) => (20L - i) * w }.sum

  /** Metrics for a system list (id, sys_rank ≤ k) left-joined with ground
    * truth ranks (`gt_rank` null when the doc is outside the truth top-20):
    * one aggregate row (n_sys, overlap, dcg_u, ndcg_milli, rr_u).
    */
  def metrics(joined: DataFrame): DataFrame = {
    val w = array(DcgWeightsMicro.map(lit): _*)
    val rel = lit(21L) - col("gt_rank")
    joined.agg(
      count(lit(1)).as("n_sys"),
      sum(when(col("gt_rank").isNotNull, 1L).otherwise(0L)).as("overlap"),
      sum(when(col("gt_rank").isNotNull && col("sys_rank") <= 10,
        rel * element_at(w, col("sys_rank").cast("int"))).otherwise(0L))
        .as("dcg_u"),
      max(when(col("gt_rank") === 1,
          expr(s"${HybridRetrieval.RrfScale} div sys_rank"))
        .otherwise(0L)).as("rr_u"))
      .withColumn("ndcg_milli", expr(s"dcg_u * 1000 div ${IdcgMicro}L"))
      .select("n_sys", "overlap", "dcg_u", "ndcg_milli", "rr_u")
  }
}
