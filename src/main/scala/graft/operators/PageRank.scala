package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — graph analytics for entity
  * importance (suppliers/customers, doc-link graphs, kNN graphs).
  *
  * Arithmetic is EXACT fixed-point: ranks are longs at `scale`, damping is
  * applied as a permille integer, and per-edge contributions use integer
  * division — so the result is independent of partial-aggregation order
  * (long sums commute exactly, unlike doubles) and bit-reproducible by any
  * engine with 64-bit integer math, which is what makes `q_pagerank` fully
  * oracle-checkable. Dangling-node mass is not redistributed (documented
  * variant; dangling nodes keep the teleport base).
  *
  * Scale shape per iteration: one hash join edges⋈ranks on src (both sides
  * partitioned by src; outdeg is pre-joined once), one partial-aggregated
  * groupBy dst, one left join back to the node set — all key-partitioned,
  * no driver state, no global window. `localCheckpoint` per iteration
  * truncates the iterative-lineage blowup (same discipline as
  * ConnectedComponents / KnnGraph).
  */
object PageRank {

  /** @param edges DataFrame with long columns (src, dst); parallel edges
    *   should be pre-deduplicated by the caller if unwanted
    * @return (node, r) — fixed-point rank at `scale` after `iters` rounds
    */
  def run(edges: DataFrame, iters: Int, dampingPermille: Long = 850L,
      scale: Long = 1000000000000L): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val base = (scale * (1000L - dampingPermille)) / (1000L * n)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // loop-invariant: materialize once, or every iteration re-executes the
    // caller's whole edge derivation (joins/distinct) inside its own plan
    val contribSrc = edges.join(outdeg, Seq("src")).localCheckpoint()
    var ranks = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      val contribs = contribSrc
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(r * $dampingPermille) div (1000 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("cs"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
