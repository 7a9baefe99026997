package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** @param edges DataFrame with long columns (src, dst)
    * @param dedup collapse parallel edges before ranking (free here: it
    *   reuses the src partitioning pass instead of costing its own
    *   (src,dst) shuffle — prefer this over a caller-side `.distinct()`)
    * @param checkpointEvery truncate rank lineage every this many
    *   iterations. Chaining a few join+agg rounds in ONE job is cheaper
    *   than materializing the full rank table per round (each checkpoint
    *   is an extra action + storage write of |V| rows); unbounded chaining
    *   blows up plan analysis time. 3 is the measured sweet spot at sf0.1
    *   and keeps plan depth constant for any iteration count.
    * @return (node, r) — fixed-point rank at `scale` after `iters` rounds
    */
  def run(edges: DataFrame, iters: Int, dampingPermille: Long = 850L,
      scale: Long = 1000000000000L, dedup: Boolean = false,
      checkpointEvery: Int = 3): DataFrame = {
    // ONE partitioning pass over the edges: hash by src, then the (src,dst)
    // dedup, the outdeg aggregation and the edges⋈outdeg join all reuse it
    // (hash on a subset of the grouping/join keys satisfies their required
    // clustering) — one shuffle where caller-side distinct + groupBy + join
    // would cost three
    val bySrc = edges.repartition(col("src"))
    val e = if (dedup) bySrc.distinct() else bySrc
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // loop-invariant: materialize once, or every iteration re-executes the
    // caller's whole edge derivation (joins/distinct) inside its own plan.
    // The checkpoint also pins the src hash partitioning, so each
    // iteration's contribution join shuffles only the (small) rank side.
    val contribSrc = e.join(outdeg, Seq("src")).localCheckpoint()
    // node set from the already-materialized edges, not a re-derivation
    val nodes = contribSrc.select(col("src").as("node"))
      .unionByName(contribSrc.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val base = (scale * (1000L - dampingPermille)) / (1000L * n)
    var ranks = nodes.withColumn("r", lit(scale / n))
    for (i <- 1 to iters) {
      val contribs = contribSrc
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(r * $dampingPermille) div (1000 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("cs"), lit(0L))).as("r"))
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart): teleport mass
    * returns only to the source set, so ranks measure proximity TO the
    * sources rather than global importance — the recommendation /
    * similar-entities primitive. `isSource` is a predicate over
    * `col("node")`, evaluated once on the materialized node set. Same
    * fixed-point integer arithmetic, shuffle shape and checkpoint cadence
    * as [[run]] — one extra boolean column rides the node table; nodes
    * outside the source set start (and teleport) at 0.
    */
  def runPersonalized(edges: DataFrame, isSource: Column, iters: Int,
      dampingPermille: Long = 850L, scale: Long = 1000000000000L,
      dedup: Boolean = false, checkpointEvery: Int = 3): DataFrame = {
    val bySrc = edges.repartition(col("src"))
    val e = if (dedup) bySrc.distinct() else bySrc
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val contribSrc = e.join(outdeg, Seq("src")).localCheckpoint()
    val nodes = contribSrc.select(col("src").as("node"))
      .unionByName(contribSrc.select(col("dst").as("node"))).distinct()
      .withColumn("is_src", isSource)
      .localCheckpoint()
    val nS = nodes.filter(col("is_src")).count()
    require(nS > 0, "personalized PageRank needs a non-empty source set")
    val base = (scale * (1000L - dampingPermille)) / (1000L * nS)
    var ranks = nodes
      .select(col("node"),
        when(col("is_src"), lit(scale / nS)).otherwise(lit(0L)).as("r"))
    for (i <- 1 to iters) {
      val contribs = contribSrc
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(r * $dampingPermille) div (1000 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_src"), lit(base)).otherwise(lit(0L)) +
            coalesce(col("cs"), lit(0L))).as("r"))
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
