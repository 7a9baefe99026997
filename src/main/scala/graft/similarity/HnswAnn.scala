package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical graph ANN — the full HNSW shape (Malkov & Yashunin 2016)
  * on DataFrames: geometrically sparser layers (deterministic 1-in-4
  * decimation by content hash, mirroring HNSW's exponential level
  * assignment), a kNN graph per layer ([[KnnGraph]]), and search that
  * descends — coarse layers localize the query in O(log n) cheap hops,
  * the bottom layer refines to the final top-k.
  *
  * vs flat [[GraphAnn]]: entry points come from the layer above instead
  * of LSH buckets, so search cost per query is (layers × beam × degree)
  * candidate scorings — independent of corpus size even when bucket
  * populations grow. Layer membership is a pure function of vec_id, so
  * builds are reproducible and incremental appends keep their levels.
  *
  * Scale shape: layer i holds ~n/4^i vectors; total build cost ≈ 4/3 of
  * the bottom graph alone. All search steps are the equality joins of
  * GraphAnn.searchFrom — nothing quadratic, nothing driver-side.
  */
object HnswAnn {

  /** Decimation factor between adjacent layers. */
  val Fanout = 4

  /** Layer-i corpus: vectors whose content hash ≡ 0 mod 4^i (nested). */
  def layerCorpus(corpus: DataFrame, layer: Int): DataFrame =
    if (layer == 0) corpus
    else corpus.filter(
      pmod(xxhash64(col("vec_id")), lit(math.pow(Fanout, layer).toLong)) === 0)

  /** Build the layer graphs, bottom (0, full) to top (sparsest). */
  def build(corpus: DataFrame, layers: Int, k: Int,
      rounds: Int): Seq[(DataFrame, DataFrame)] =
    (0 until layers).map { i =>
      val c = layerCorpus(corpus, i)
      (KnnGraph.build(c, k, rounds), c)
    }

  /** Layers on top of an existing bottom-layer graph (the expensive one —
    * callers typically already maintain the corpus kNN graph; the upper
    * layers cost a geometric fraction of it).
    */
  def buildAbove(corpus: DataFrame, bottomGraph: DataFrame, layers: Int,
      k: Int, rounds: Int): Seq[(DataFrame, DataFrame)] =
    (bottomGraph, corpus) +: (1 until layers).map { i =>
      val c = layerCorpus(corpus, i)
      (KnnGraph.build(c, k, rounds), c)
    }

  /** Top-k per query by layered descent: fixed entries on the sparsest
    * layer, each layer's beam seeds the next finer layer.
    */
  def search(layerGraphs: Seq[(DataFrame, DataFrame)], queries: DataFrame,
      k: Int, beam: Int, hopsPerLayer: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding"))
    val top = layerGraphs.last._2
    var entries = q.select(col("query_id"))
      .crossJoin(broadcast(top.orderBy(col("vec_id").asc).limit(4)
        .select(col("vec_id").as("cand"))))
    var result: DataFrame = null
    for (((g, c), i) <- layerGraphs.zipWithIndex.reverse) {
      val kk = if (i == 0) k else beam
      // upper layers only LOCALIZE the query — one hop each; the bottom
      // layer does the configured refinement hops
      val hops = if (i == 0) hopsPerLayer else 1
      result = GraphAnn.searchFrom(g, c, queries, entries, kk, beam, hops)
      // descend: this layer's beam becomes the finer layer's entries
      // (layer members exist in every finer layer — nested decimation)
      entries = result.select(col("query_id"), col("neighbor_id").as("cand"))
    }
    result
  }
}
