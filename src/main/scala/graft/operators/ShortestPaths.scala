package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source shortest paths by synchronous Bellman–Ford rounds — the
  * remaining classic next to PageRank / CC / k-core / label propagation:
  * reachability with cost (supply-chain hop analysis, link-distance
  * features for ranking).
  *
  * Each round relaxes every edge once: dist' = min(dist, min over
  * incoming (dist(src) + w)) — one equality join on src + one min
  * aggregate on dst, both hash-partitioned on node ids, lineage truncated
  * per round. A FIXED round count (= hop bound) keeps the computation
  * replayable by the oracle round-for-round (the KCore discipline);
  * relaxation is monotone (node set only grows, each dist only falls), so
  * an unchanged (count, sum) pair between the last two rounds proves the
  * fixed point, reported in-band as `converged`.
  */
object ShortestPaths {

  /** @param edges directed weighted edges (src, dst, w ≥ 0, longs)
    * @return one row: (n_reached, dist_sum, dist_max, path_xor, converged)
    *         over nodes reached within `rounds` hops; path_xor binds each
    *         node to its distance, so one wrong relaxation breaks it
    */
  def run(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
    var prev = (-1L, -1L)
    var last = (-2L, -2L)
    for (i <- 1 to rounds) {
      val relaxed = dist
        .join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      if (i >= rounds - 1) {
        val r = relaxed.agg(count(lit(1)), sum(col("dist"))).head()
        prev = last
        last = (r.getLong(0), r.getLong(1))
      }
      dist = relaxed
    }
    dist.agg(count(lit(1)).as("n_reached"),
        sum(col("dist")).as("dist_sum"),
        max(col("dist")).as("dist_max"),
        expr("bit_xor(node * 100000 + dist)").as("path_xor"))
      .withColumn("converged", lit(prev == last))
  }
}
