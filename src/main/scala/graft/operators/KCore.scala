package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling: iteratively delete nodes of degree < k until the
  * residual graph stabilizes — the standard dense-substructure filter
  * (graph cleaning before community detection; spam/bot subgraph mining on
  * co-occurrence graphs).
  *
  * A fixed round count keeps the computation replayable by the oracle
  * (generated round-by-round SQL, the LabelPropagation discipline); each
  * round is one degree aggregate + two semi joins, all hash-partitioned on
  * node ids, `localCheckpoint` truncating lineage per round. Rounds are
  * monotone (node sets only shrink), so once stable every further round is
  * a no-op — `rounds` bounds work, not correctness, and convergence is
  * reported in-band.
  */
object KCore {

  /** Residual node set after `rounds` peels.
    *
    * @param pairs undirected edges (any direction, dups tolerated)
    * @return one row: (n_nodes, node_xor, n_edges, converged) — surviving
    *         node count/xor, surviving canonical edge count, and whether
    *         the last round changed nothing (fixed point reached)
    */
  def run(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    var edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var prevNodes = -1L
    var lastNodes = 0L
    for (i <- 1 to rounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      val pruned = edges
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      // the fixed-point check only compares the LAST two rounds — earlier
      // rounds need no extra action beyond the checkpoint materialization
      if (i >= rounds - 1) {
        prevNodes = lastNodes
        lastNodes = pruned.select(col("src")).distinct().count()
      }
      edges = pruned
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    val converged = prevNodes == lastNodes
    nodes.agg(count(lit(1)).as("n_nodes"),
        expr("bit_xor(node)").as("node_xor"))
      .crossJoin(broadcast(
        edges.filter(col("src") < col("dst"))
          .agg(count(lit(1)).as("n_edges"))))
      .withColumn("converged", lit(converged))
  }
}
