package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step a
  * dedup pipeline needs to turn near-duplicate PAIRS into duplicate GROUPS
  * (pick one representative per component, drop the rest).
  *
  * Spark has no built-in CC, so this composes DataFrame ops: iterative
  * min-label propagation with pointer jumping (label := label(label) each
  * round, as in PRAM/MapReduce CC literature), which converges in
  * O(log diameter) rounds instead of O(diameter) for plain propagation.
  * Each round is two shuffles (neighbor-min groupBy + the jump self-join) on
  * the node id — no collect, no driver-side graph, so it holds at 100 TB
  * edge lists. `localCheckpoint` truncates lineage each round so plans don't
  * grow with iteration count.
  *
  * Convergence is reached when no label changes; the label of every node is
  * then the minimum node id of its component.
  */
object ConnectedComponents {

  /** @param edges undirected edge list; self-loops and duplicates tolerated
    * @param src   source-node column name
    * @param dst   destination-node column name
    * @return (id, component) — one row per distinct node, component = min
    *         node id reachable from it
    */
  def apply(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // seed each node with min(self, direct neighbors) — this IS the first
    // propagation step, one aggregation instead of node-list + join
    var labels = sym.groupBy(col("u"))
      .agg(least(col("u"), min("v")).as("label"))
      .select(col("u").as("id"), col("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("v") === labels("id"))
        .groupBy(sym("u").as("nid")).agg(min("label").as("nlabel"))
      // carry the previous label so the convergence test is a scan of the
      // checkpointed result, not another join
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"), labels("label").as("old"),
          least(labels("label"), coalesce(col("nlabel"), labels("label")))
            .as("label"))
      // pointer jump: labels always point at node ids, so label(label) exists
      val parents = stepped.select(col("id").as("pid"), col("label").as("plabel"))
      val jumped = stepped.join(parents, stepped("label") === parents("pid"))
        .select(stepped("id"), stepped("old"),
          least(stepped("label"), col("plabel")).as("label"))
        .localCheckpoint()
      converged = jumped.filter(col("label") =!= col("old")).isEmpty
      labels = jumped.select("id", "label")
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
