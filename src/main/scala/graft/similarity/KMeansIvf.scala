package graft.similarity

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.VectorExprs
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN with k-means coarse quantizer — the classic
  * billion-scale index structure, built with plain DataFrame ops:
  *
  *  - **fit**: deterministic Lloyd's iterations over a bounded, hash-sampled,
  *    CACHED working set. A coarse quantizer needs ~1M points, not the
  *    corpus: at 100 TB the fit reads the corpus once (for the sample), then
  *    iterates over the cached sample only. Assignment is a map-only pass
  *    (centroids ride inside a native expression — no join); the centroid
  *    update is a typed `Aggregator` summing fixed-point vectors, so partial
  *    aggregation applies and only k×dim longs shuffle per iteration (the
  *    earlier posexplode formulation shuffled n×dim rows). Only k×dim
  *    doubles ever reach the driver.
  *  - **index**: corpus tagged with its cluster id; at scale, WRITE the
  *    corpus partitioned/bucketed by `cluster` so probes prune at the scan.
  *  - **search**: each query probes its `nprobe` nearest clusters (recall
  *    knob), re-ranking candidates by exact cosine. Small probe sets are
  *    broadcast; above `maxBroadcastQueries` the probe set falls back to a
  *    shuffled hash join on `cluster` so a huge query batch can't OOM the
  *    driver/executors with a broadcast.
  *
  * Determinism: init = the k lowest-vec_id vectors; the sample filter is a
  * content hash (layout-independent, unlike `DataFrame.sample` whose output
  * depends on partitioning); centroid sums are exact fixed-point longs, so
  * they do not depend on partial-aggregation merge order. fit/search
  * reproduce across runs and retries.
  */
object KMeansIvf {

  /** 2^32 fixed-point scale: exact long sums, ~1e-10 element precision —
    * far below any quantizer's needs; overflow headroom ~2^31 rows per
    * cluster at |x| <= 1 (embedding components are O(1)).
    */
  private val FpScale = 4294967296.0

  // public: ExpressionEncoder needs constructor access from generated code
  final case class CentroidBuf(sums: Array[Long], n: Long)
  final case class CentroidOut(values: Array[Double], n: Long)

  /** Exact fixed-point mean of float vectors: order-independent (long sums),
    * partial-aggregation-friendly (k×dim longs per map task). Package-private
    * so ProductQuantizer's fused per-subspace fit reuses it.
    */
  private[similarity] final class CentroidSum(dim: Int)
      extends Aggregator[Array[Float], CentroidBuf, CentroidOut] {
    override def zero: CentroidBuf = CentroidBuf(new Array[Long](dim), 0L)
    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
      var i = 0
      while (i < dim) { b.sums(i) += (v(i) * FpScale).toLong; i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.n + b.n)
    }
    override def finish(b: CentroidBuf): CentroidOut =
      CentroidOut(b.sums.map(_ / FpScale / math.max(b.n, 1L)), b.n)
    override def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
    override def outputEncoder: Encoder[CentroidOut] = ExpressionEncoder[CentroidOut]()
  }

  /** Lloyd's k-means; returns k centroids (k×dim doubles).
    *
    * @param maxFitRows cap on the working-set size: above it the corpus is
    *   down-sampled by a deterministic content hash on `vec_id` before the
    *   iteration loop, and the sample is cached so the corpus itself is
    *   scanned exactly once regardless of `iters`.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
      maxFitRows: Long = 1L << 20): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val slim = corpus.select(col("vec_id"), col("embedding"))
    val n = slim.count()
    val sampled =
      if (n <= maxFitRows) slim
      else {
        val perMillion = math.max((maxFitRows.toDouble / n * 1e6).toLong, 1L)
        slim.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) < lit(perMillion))
      }
    val work = sampled.cache()
    try {
      var centroids: Array[Array[Double]] = work
        .orderBy("vec_id").limit(k)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val dim = centroids.headOption.map(_.length).getOrElse(0)
      val agg = new CentroidSum(dim).toColumn
      for (_ <- 1 to iters) {
        val updated = work
          .select(
            VectorExprs.nearest_centroid(col("embedding"), centroids).as("cluster"),
            col("embedding"))
          .as[(Int, Array[Float])]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(agg)
          .collect()
          .map { case (c, out) => c -> out.values }
          .toMap
        // clusters that lost all members keep their previous centroid
        centroids = centroids.indices.map { c =>
          updated.getOrElse(c, centroids(c))
        }.toArray
      }
      centroids
    } finally work.unpersist()
  }

  /** Corpus tagged with its inverted-list id. */
  def index(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    corpus.withColumn("cluster",
      VectorExprs.nearest_centroid(col("embedding"), centroids))

  /** Top-k per query, probing `nprobe` clusters.
    *
    * @param maxBroadcastQueries probe-set rows (queries × nprobe) at or below
    *   which the probe side is broadcast (map-side join, corpus never
    *   shuffles). Above it the join falls back to a shuffled hash join on
    *   `cluster` — both sides repartition by cluster id, no broadcast OOM.
    */
  def search(indexed: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], k: Int, nprobe: Int,
      maxBroadcastQueries: Long = 1L << 20): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qvec"),
      explode(VectorExprs.nearest_centroids(col("embedding"), centroids, nprobe))
        .as("cluster"))
    val c = indexed.select(col("cluster"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val probeRows = queries.count() * nprobe
    val joined =
      if (probeRows <= maxBroadcastQueries) c.join(broadcast(q), Seq("cluster"))
      else c.join(q, Seq("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("long").as("rk"))
  }
}
