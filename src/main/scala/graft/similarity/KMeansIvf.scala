package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.VectorExprs
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN with k-means coarse quantizer — the classic
  * billion-scale index structure, built with plain DataFrame ops:
  *
  *  - **fit**: deterministic Lloyd's iterations. Assignment is a map-only
  *    pass (centroids ride inside a native expression — no join); the
  *    centroid update is one `posexplode → groupBy(cluster, dim) → avg`
  *    shuffle per iteration. Only k×dim doubles ever reach the driver.
  *  - **index**: corpus tagged with its cluster id; at scale, WRITE the
  *    corpus partitioned/bucketed by `cluster` so probes prune at the scan.
  *  - **search**: each query probes its `nprobe` nearest clusters (recall
  *    knob), re-ranking candidates by exact cosine.
  *
  * Determinism: init = the k lowest-vec_id vectors, fixed iteration count —
  * no PRNG, so fit/search reproduce across runs and retries.
  */
object KMeansIvf {

  /** Lloyd's k-means; returns k centroids (k×dim doubles). */
  def fit(corpus: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = corpus
      .orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(
        VectorExprs.nearest_centroid(col("embedding"), centroids).as("cluster"),
        col("embedding"))
      val updated = assigned
        .select(col("cluster"), posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      // clusters that lost all members keep their previous centroid
      centroids = centroids.indices.map { c =>
        updated.get(c).map(_.toArray).getOrElse(centroids(c))
      }.toArray
    }
    centroids
  }

  /** Corpus tagged with its inverted-list id. */
  def index(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    corpus.withColumn("cluster",
      VectorExprs.nearest_centroid(col("embedding"), centroids))

  /** Top-k per query, probing `nprobe` clusters. */
  def search(indexed: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qvec"),
      explode(VectorExprs.nearest_centroids(col("embedding"), centroids, nprobe))
        .as("cluster"))
    val c = indexed.select(col("cluster"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("long").as("rk"))
  }
}
