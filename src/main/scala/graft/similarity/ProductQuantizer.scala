package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.VectorExprs
import graft.functions.VectorFunctions

/** Product quantization (PQ) — the compressed-index leg of billion-scale
  * ANN (IVF-PQ): split each vector into `m` subspaces, k-means each
  * subspace ([[KMeansIvf.fit]] per slice — sampled, cached, deterministic),
  * and store each vector as `m` small codes. A 64-dim float32 embedding
  * (256 B) becomes 8 codes (≤8 B): the whole index fits in a fraction of
  * the corpus footprint, so the scan side of a 100 TB search reads ~1/32 of
  * the bytes and never touches float arrays.
  *
  * Search is asymmetric distance computation (ADC): per query, precompute
  * the m×k table of subspace dot products ONCE (a per-query literal-sized
  * computation), then a candidate's approximate dot product is `m` table
  * lookups — `zip_with` + `aggregate` over the code array, fully
  * codegen-friendly, no float math per candidate. Top candidates are
  * re-ranked by exact cosine against the uncompressed vectors (a join that
  * touches only `refine × |queries|` rows).
  */
object ProductQuantizer {

  /** `codebooks(sub)(code)` = centroid (subDim doubles) of `code` in
    * subspace `sub`.
    */
  final case class Model(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
  }

  /** Fit per-subspace codebooks. `dim` must be divisible by `m`.
    *
    * All m subspace k-means run FUSED: one sampled+cached working set, one
    * init collect, and per Lloyd's iteration ONE job that assigns every
    * (row × subspace) and aggregates all m×k centroid sums together
    * (posexplode of m structs → typed fixed-point Aggregator keyed by
    * (subspace, cluster)). Total actions: 2 + iters, independent of m — the
    * sequential per-subspace formulation paid m× that.
    */
  def fit(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
      maxFitRows: Long = 1L << 20): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
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
      val initRows = work.orderBy("vec_id").limit(k)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      var codebooks = Array.tabulate(m) { sub =>
        initRows.map(_.slice(sub * subDim, (sub + 1) * subDim))
      }
      val agg = new KMeansIvf.CentroidSum(subDim).toColumn
      for (_ <- 1 to iters) {
        val perSub = (0 until m).map { sub =>
          struct(
            lit(sub).as("sub"),
            VectorExprs.nearest_centroid(
              slice(col("embedding"), sub * subDim + 1, subDim),
              codebooks(sub)).as("cluster"),
            slice(col("embedding"), sub * subDim + 1, subDim).as("subvec"))
        }
        val updated = work
          .select(explode(array(perSub: _*)).as("a"))
          .select(col("a.sub"), col("a.cluster"), col("a.subvec"))
          .as[(Int, Int, Array[Float])]
          .groupByKey(t => (t._1, t._2))
          .mapValues(_._3)
          .agg(agg)
          .collect()
          .map { case ((sub, c), out) => (sub, c) -> out.values }
          .toMap
        codebooks = Array.tabulate(m) { sub =>
          Array.tabulate(k) { c =>
            updated.getOrElse((sub, c), codebooks(sub)(c))
          }
        }
      }
      Model(subDim, codebooks)
    } finally work.unpersist()
  }

  /** Compress the corpus: (vec_id, codes array<int> of length m). This is
    * the PQ index — at scale, what gets written/bucketed/scanned.
    */
  def encode(corpus: DataFrame, model: Model): DataFrame = {
    val codeCols = model.codebooks.zipWithIndex.map { case (cb, sub) =>
      VectorExprs.nearest_centroid(
        slice(col("embedding"), sub * model.subDim + 1, model.subDim), cb)
    }
    corpus.select(col("vec_id"), array(codeCols.toIndexedSeq: _*).as("codes"))
  }

  /** Exact-order dot product of two double arrays (same fold as
    * VectorFunctions.dot, operands already double).
    */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Probe set with its per-query ADC lookup table:
    * tab(sub)(code) = <q_sub, centroid>.
    */
  private def withAdcTable(queries: DataFrame, model: Model): DataFrame = {
    val cbLit = typedlit(
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq) // m × k × subDim
    val tab = transform(cbLit, (cb, sub) =>
      transform(cb, cent =>
        dotD(slice(col("qvec"), sub * lit(model.subDim) + lit(1), lit(model.subDim))
          .cast("array<double>"), cent)))
    queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qvec")).withColumn("tab", tab)
  }

  /** ADC rank (m table lookups per candidate) → keep `refine` → exact
    * cosine re-rank of the survivors only. `joined` carries (query_id,
    * qvec, tab, neighbor_id, codes).
    */
  private def adcRankAndRefine(joined: DataFrame, corpus: DataFrame,
      k: Int, refine: Int): DataFrame = {
    val approx = aggregate(
      zip_with(col("codes"), col("tab"), (c, t) => element_at(t, c + 1)),
      lit(0.0), (acc, v) => acc + v)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("neighbor_id").asc)
    val cand = joined
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adot", approx)
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= lit(refine))
      .select(col("query_id"), col("neighbor_id"), col("qvec"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cvec"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(c, Seq("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rk").cast("long").as("rk"))
  }

  /** ADC top-k over the WHOLE compressed index: approximate-rank all codes
    * per query, keep `refine` candidates, re-rank them by exact cosine.
    *
    * @param encoded [[encode]] output (the compressed index)
    * @param queries (vec_id, embedding) probe set — broadcast
    * @param corpus  uncompressed vectors, joined ONLY for the `refine`
    *                surviving candidates per query
    */
  def searchADC(encoded: DataFrame, queries: DataFrame, corpus: DataFrame,
      model: Model, k: Int, refine: Int = 50): DataFrame = {
    val q = withAdcTable(queries, model)
    val joined = encoded.select(col("vec_id").as("neighbor_id"), col("codes"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
    adcRankAndRefine(joined, corpus, k, refine)
  }

  /** IVF-PQ search — the canonical billion-scale composition: the coarse
    * k-means quantizer ([[KMeansIvf]]) prunes each query's scan to its
    * `nprobe` inverted lists, PQ-ADC ranks only the codes INSIDE those
    * lists, and exact cosine re-ranks the survivors. At 100 TB the scan
    * touches nprobe/k-ths of a ~32×-compressed, cluster-bucketed index —
    * both pruning axes compound.
    *
    * @param encodedIndexed [[encode]] output plus the coarse `cluster`
    *   column (vec_id, codes, cluster) — what the corpus would be written
    *   bucketed by
    */
  def searchIvfPq(encodedIndexed: DataFrame, queries: DataFrame,
      corpus: DataFrame, centroids: Array[Array[Double]], model: Model,
      k: Int, nprobe: Int, refine: Int = 50): DataFrame = {
    val q = withAdcTable(queries, model).withColumn("cluster",
      explode(VectorExprs.nearest_centroids(col("qvec"), centroids, nprobe)))
    val joined = encodedIndexed
      .select(col("cluster"), col("vec_id").as("neighbor_id"), col("codes"))
      .join(broadcast(q), Seq("cluster"))
    adcRankAndRefine(joined, corpus, k, refine)
  }
}
