package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) with deterministic
  * tie-breaking.
  *
  * Each round, every node adopts the most frequent label among its
  * neighbors, ties going to the SMALLEST label — argmax-by-count with a
  * total tie order makes every round a pure function of the previous
  * labeling, so results are identical across engines, partitionings and
  * cluster sizes (classic LPA's random tie-breaking is unreproducible by
  * design; determinism is what lets the oracle replay the rounds).
  *
  * One round = one equality join (labels shipped to neighbors, partitioned
  * by dst) + one count aggregate + one per-node window over that node's
  * distinct neighbor LABELS (bounded by degree — no global sort). A fixed
  * round count keeps the whole computation one declarative plan; communities
  * stabilize in a few rounds on the co-occurrence graphs this targets.
  */
object LabelPropagation {

  /** @param pairs undirected edges, any direction, duplicates tolerated
    * @return (node, label) after `iters` synchronous rounds from
    *         label(v) = v
    */
  def run(pairs: DataFrame, aCol: String, bCol: String, iters: Int): DataFrame = {
    // materialize the edge set once — every round joins against it, and
    // recomputing the canonicalization per round would re-run the (often
    // expensive) upstream pair generation `iters` times
    val und = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      // pin the checkpoint on the JOIN key: distinct leaves (src,dst)
      // hash partitioning, which every round's dst-join would reshuffle;
      // partitioned by dst, only the (small) label side moves per round
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val counts = und
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax-by-(c, -label) as a hash aggregate: lexicographic struct max
      // ≡ the (count desc, label asc) window rank, without the per-node sort
      labels = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    }
    labels
  }
}
