package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.similarity.Similarity

/** Semantic (embedding-space) deduplication, SemDeDup-style: cluster
  * near-duplicate embeddings and keep one representative per cluster.
  *
  * Pipeline: LSH-blocked cosine pairs ([[graft.similarity.Similarity.cosineNearDups]] — an
  * equality join on deterministic hyperplane buckets, never all-pairs) →
  * connected components over the pair graph ([[graft.operators.ConnectedComponents]] —
  * min-label, no driver-side graph) → drop every member whose component
  * representative (min id) is someone else.
  *
  * Scale shape: both stages are the already-bounded building blocks; the
  * final anti-join ships only ids. Embeddings travel once (into their LSH
  * bucket); no similarity work happens across buckets.
  */
object SemanticDedup {

  /** @return the surviving rows of `embeddings` (one representative per
    *         near-dup cluster, all singletons untouched)
    */
  def survivors(embeddings: DataFrame, threshold: Double): DataFrame = {
    val pairs = Similarity.cosineNearDups(embeddings, threshold)
    val comp = ConnectedComponents(
      pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")))
    val dropped = comp.filter(col("component") < col("id"))
      .select(col("id").as("vec_id"))
    embeddings.join(dropped, Seq("vec_id"), "left_anti")
  }
}
