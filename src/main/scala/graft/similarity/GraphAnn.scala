package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Graph-based ANN serving: beam search over a prebuilt kNN graph
  * ([[KnnGraph]]) — the batch analogue of HNSW's layer-0 search
  * (Malkov & Yashunin, 2016), with the greedy frontier replaced by a
  * fixed number of synchronized hops so the whole query batch advances
  * together.
  *
  * Each hop: frontier → graph-neighbor expansion (equality join on the
  * frontier vector id), candidate dedup, embedding attach by id, cosine
  * score, top-`beam` per query. Per-query work is bounded by beam×degree
  * candidates per hop — independent of corpus size — and nothing is ever
  * broadcast or collected except the constant entry-point list: the shape
  * that serves a query batch against a billion-vector graph.
  *
  * Entry points are the query's LSH bucket mates (same sign-hash bucket →
  * likely close, the HNSW upper-layer replacement) unioned with a fixed
  * handful of lowest-id vectors so a query with an empty bucket still
  * starts somewhere.
  */
object GraphAnn {

  /** (query_id, neighbor_id, cos, rk) — top-k per query vector.
    *
    * @param graph   (src, dst, ...) prebuilt neighbor edges (KnnGraph.build)
    * @param corpus  (vec_id, embedding)
    * @param queries (vec_id, embedding)
    */
  def search(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, beam: Int, hops: Int): DataFrame = {
    val v = corpus.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val qb = q.select(col("query_id"), lshBucket(col("qv")).as("bucket"))
    val cb = v.select(col("vec_id").as("cand"), lshBucket(col("embedding")).as("bucket"))
    val bucketEntries = qb.join(cb, Seq("bucket"))
      .select(col("query_id"), col("cand"))
    val fixedEntries = q.select(col("query_id"))
      .crossJoin(broadcast(
        v.orderBy(col("vec_id").asc).limit(4).select(col("vec_id").as("cand"))))
    searchFrom(graph, corpus, queries,
      bucketEntries.unionByName(fixedEntries), k, beam, hops)
  }

  /** Beam search from caller-provided entry candidates (query_id, cand) —
    * the layer-descent primitive [[HnswAnn]] composes: entries come from
    * the coarser layer's result instead of LSH buckets.
    */
  def searchFrom(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      entries: DataFrame, k: Int, beam: Int, hops: Int): DataFrame = {
    val v = corpus.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    // same shuffle discipline as KnnGraph.scoreTopK: dedup + embedding
    // attach share the cand partitioning, the query attach reshuffles by
    // query_id and the top-beam window reuses that clustering
    def topBeam(cands: DataFrame, n: Int): DataFrame = {
      val scored = cands.repartition(col("cand")).distinct()
        .join(v.select(col("vec_id").as("cand"), col("embedding").as("cv")), Seq("cand"))
        .join(q, Seq("query_id"))
        .select(col("query_id"), col("cand"), cosine(col("qv"), col("cv")).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("cand").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= lit(n))
        .select(col("query_id"), col("cand"), col("cos"))
    }

    var frontier = topBeam(entries, beam)
      .localCheckpoint()
    for (_ <- 1 to hops) {
      val expanded = frontier.select(col("query_id"), col("cand").as("src"))
        .join(graph.select(col("src"), col("dst")), Seq("src"))
        .select(col("query_id"), col("dst").as("cand"))
        .unionByName(frontier.select(col("query_id"), col("cand")))
      frontier = topBeam(expanded, beam).localCheckpoint()
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand").asc)
    frontier.withColumn("rk", row_number().over(w)).filter(col("rk") <= lit(k))
      .select(col("query_id"), col("cand").as("neighbor_id"), col("cos"),
        col("rk").cast("long").as("rk"))
  }
}
