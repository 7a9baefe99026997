package graft.similarity

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate kNN-GRAPH construction for the whole corpus — the primitive
  * behind embedding-level dedup, clustering, and graph-based ANN serving.
  * Unlike the query-set searches in [[Similarity]], every vector gets its
  * top-k neighbors.
  *
  * NN-Descent-style (Dong et al., WWW 2011): initialize candidates from
  * LSH buckets (each vector meets its bucket-mates), then iterate
  * "a neighbor of my neighbor is probably my neighbor" — expand via
  * neighbor-of-neighbor joins over the UNDIRECTED current graph, score,
  * and keep the top-k per vector.
  *
  * Scale shape: every step is an equality join on vector ids or bucket
  * keys — hash-partitioned, never all-pairs. Per round the candidate set
  * is ≤ n·(2k)² edges (bounded fan-out), embeddings are attached by two
  * id-joins (embedding bytes shuffle only to their candidate partners, the
  * corpus is never broadcast), and ranking is a window partitioned by
  * source vector — bounded per-partition state. Rounds are a fixed small
  * constant (2–3 reaches ~full recall on clustered data), so the whole
  * build is O(rounds) shuffles of O(n·k²) id-pair rows.
  */
object KnnGraph {

  /** (src, dst, cos, rk) — top-k approximate neighbors per corpus vector. */
  def build(corpus: DataFrame, k: Int, rounds: Int): DataFrame = {
    // id+embedding projection is joined twice per scoring round — pin it
    // once instead of re-scanning the source 2×rounds times
    val v = corpus.select(col("vec_id"), col("embedding")).localCheckpoint()

    // Shuffle discipline: the candidate-pair set is the widest data in the
    // build, so each scoring pass moves it exactly twice — repartition by
    // dst (the (src,dst) dedup and the dst-embedding join both reuse that
    // clustering), then one reshuffle by src for the src-embedding join,
    // which the top-k window then reuses. Embeddings are projected out
    // before the window so it sorts (src,dst,cos) rows, not vector payloads.
    def scoreTopK(pairs: DataFrame): DataFrame = {
      val uniq = pairs.repartition(col("dst")).distinct()
      val scored = uniq
        .join(v.select(col("vec_id").as("dst"), col("embedding").as("dv")), Seq("dst"))
        .join(v.select(col("vec_id").as("src"), col("embedding").as("sv")), Seq("src"))
        .select(col("src"), col("dst"), cosine(col("sv"), col("dv")).as("cos"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= lit(k))
        .select(col("src"), col("dst"), col("cos"), col("rk").cast("long").as("rk"))
    }

    // init: pairs sharing an LSH bucket — good candidates, but singleton
    // buckets would leave vectors isolated (nothing the descent rounds can
    // recover from). So union a deterministic hash-ring: vectors chained in
    // content-hash order within ~256-row hash partitions, each linked to its
    // next two — guaranteed coverage, the deterministic stand-in for
    // NN-Descent's random init, and a partitioned window (never global).
    val keyed = v.select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
    val bucketPairs = keyed.select(col("bucket"), col("vec_id").as("src"))
      .join(keyed.select(col("bucket"), col("vec_id").as("dst")), Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val nParts = math.max(v.count() / 256L, 1L)
    val chainW = Window.partitionBy("part")
      .orderBy(xxhash64(col("vec_id"), lit(1L)).asc, col("vec_id").asc)
    val ring = v
      .select(col("vec_id"), pmod(xxhash64(col("vec_id")), lit(nParts)).as("part"))
      .withColumn("nxt1", lead(col("vec_id"), 1).over(chainW))
      .withColumn("nxt2", lead(col("vec_id"), 2).over(chainW))
      .withColumn("nxt", explode(array(col("nxt1"), col("nxt2"))))
      .filter(col("nxt").isNotNull)
      .select(col("vec_id").as("src"), col("nxt").as("dst"))
    val ringBoth = ring.unionByName(
      ring.select(col("dst").as("src"), col("src").as("dst")))
    // localCheckpoint per round: truncates lineage so round r doesn't
    // re-execute rounds 1..r-1 inside its own plan (the iterative-DataFrame
    // trap — same discipline as ConnectedComponents)
    var graph = scoreTopK(bucketPairs.unionByName(ringBoth))
      .localCheckpoint()

    for (_ <- 1 to rounds) {
      val edges = graph.select(col("src"), col("dst"))
      val undirected = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val nn = undirected.select(col("src"), col("dst").as("mid"))
        .join(undirected.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
      graph = scoreTopK(nn.unionByName(edges)).localCheckpoint()
    }
    graph
  }
}
