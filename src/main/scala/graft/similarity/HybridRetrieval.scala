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
