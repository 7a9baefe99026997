package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by hashed-feature importance resampling — the DSIR
  * recipe (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", 2023): score every corpus document by how much its hashed
  * token distribution looks like a small TARGET corpus relative to the
  * full corpus, then keep the top-scoring docs. The reference pipeline has
  * no counterpart (it moves tables, not tokens); this is part of the
  * training-data tier the engine adds on top.
  *
  * Shape at 100 TB:
  *   1. ONE aggregation computes both distributions: tokens bucket into
  *      [[Buckets]] hashed features and `groupBy(bucket)` counts corpus
  *      and target occupancy together (target is a boolean predicate, so
  *      a conditional count — no second scan). Partial aggregation
  *      collapses each task's output to ≤ [[Buckets]] rows before the
  *      shuffle; the exchange moves O(tasks × 256) rows regardless of
  *      corpus size.
  *   2. The driver collects exactly [[Buckets]] rows (a bounded constant,
  *      the centroid-broadcast pattern) and turns them into per-bucket
  *      log-ratio weights, micro-quantized to integer 1e-6 units
  *      (`round(1e6·ln(exact rational))` — the repo-wide ln-parity rule)
  *      so per-doc sums are integer arithmetic: order-independent and
  *      replayable bit-for-bit by the DuckDB oracle.
  *   3. Scoring is a MAP-ONLY pass: the 256-long weight table rides into
  *      the plan as an array literal and `aggregate(transform(split(…)))`
  *      sums weights per document with zero shuffle and zero UDF. Top-k
  *      lands in `TakeOrderedAndProject` (per-partition heaps, no global
  *      sort).
  *
  * Smoothing is add-one on bucket counts (a bucket unseen in the target
  * still gets a finite weight), and the weight of a token is a pure
  * function of its md5 — so the same operator run on any cluster size, or
  * incrementally on new waves with frozen weights, selects identically.
  */
object ImportanceSelect {

  /** Hashed feature-space size. 256 keeps the weight table an array
    * literal in the scoring expression; DSIR itself uses 10k buckets for
    * n-grams — at that size swap the literal for a broadcast join, the
    * distribution pass is unchanged.
    */
  val Buckets = 256

  /** Feature bucket of one token: first 8 md5 hex digits → u32 → mod
    * [[Buckets]]. md5 is available and bit-identical in DuckDB, which
    * keeps candidate hashing inside the correctness gate (the
    * q_weighted_sample / q_hash_split device).
    */
  def bucketOf(w: Column): Column =
    pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(Buckets))

  /** Single-space tokens of `textCol` bucketed into the feature space.
    * Empty tokens (doubled spaces) keep their bucket — dropping them
    * would just shift both distributions by the same mass.
    */
  private def buckets(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("*"),
        explode(split(col(textCol), " ")).as("__w"))
      .select(col("*"), bucketOf(col("__w")).as("__b"))
      .drop("__w")

  /** Per-bucket micro-quantized importance weights, computed from one
    * distribution pass. Returns exactly [[Buckets]] longs; bucket b's
    * weight is round(1e6 · ln(p_target(b) / p_corpus(b))) with add-one
    * smoothing on both sides.
    */
  def bucketWeights(docs: DataFrame, textCol: String,
      isTarget: Column): Array[Long] = {
    val counts = buckets(docs, textCol)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("cc"),
        count(when(isTarget, lit(1))).as("tc"))
      .collect()
    val cc = new Array[Long](Buckets)
    val tc = new Array[Long](Buckets)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      cc(b) = r.getLong(1); tc(b) = r.getLong(2)
    }
    val nC = cc.sum.toDouble + Buckets
    val nT = tc.sum.toDouble + Buckets
    Array.tabulate(Buckets) { b =>
      // one ln over an exact rational; HALF_UP matches DuckDB's
      // round-half-away-from-zero on negatives where Math.round differs
      val x = 1e6 * math.log(((tc(b) + 1.0) * nC) / ((cc(b) + 1.0) * nT))
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Map-only per-document score: Σ over tokens of weight(bucket(token)).
    * Integer sum of longs — no float-order sensitivity.
    */
  def score(docs: DataFrame, textCol: String,
      weights: Array[Long]): DataFrame = {
    require(weights.length == Buckets, s"need $Buckets weights")
    val wlit = lit(weights)
    docs.withColumn("score_u",
      aggregate(
        transform(split(col(textCol), " "),
          w => element_at(wlit, (bucketOf(w) + lit(1)).cast("int"))),
        lit(0L), (acc, x) => acc + x))
  }

  /** End-to-end selection: fit weights on the corpus (target = predicate),
    * score every doc, keep the k best (score desc, doc_id tie-break).
    */
  def select(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, k: Int): DataFrame = {
    val w = bucketWeights(docs, textCol, isTarget)
    score(docs, textCol, w)
      .orderBy(col("score_u").desc, col(idCol).asc)
      .limit(k)
  }
}
