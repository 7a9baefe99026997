package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: the corpus laid out as a cluster-partitioned
  * parquet store, so an ANN probe READS only its `nprobe` inverted lists —
  * partition pruning at the scan, not a post-scan filter. This is the
  * serving shape of a billion-vector index: the store is built once
  * (quantizer fit + one partitioned write), probes touch
  * `nprobe / k` of the directory tree no matter how big the corpus grows.
  *
  * Same persisted-index discipline as the BM25 store (bucket-partitioned
  * postings) and the MinHash band index (band-partitioned store): the
  * partition column IS the index key, and the probed key set is enumerated
  * driver-side from a model that is O(k×dim) — never from data.
  */
object IvfStore {

  /** Fit-once + write: corpus tagged with its inverted-list id, written
    * partitioned by `cluster`; centroids persisted beside the vectors so
    * probes need no refit.
    */
  def build(corpus: DataFrame, dir: String,
      centroids: Array[Array[Double]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    KMeansIvf.index(corpus, centroids)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/vectors")
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cluster", "values").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Incremental maintenance: APPEND a new vector wave into the existing
    * inverted lists — assigned by the PERSISTED quantizer (centroids are
    * frozen; re-fitting would orphan historical assignments), written with
    * append mode into the same cluster partitions. No rebuild, history
    * never re-read; probes see old∪new because partition files union at
    * the scan. Quantizer drift after many waves is a compaction-time
    * refit + rewrite, the classic IVF operational trade.
    */
  def append(wave: DataFrame, dir: String): Unit = {
    val cents = centroids(wave.sparkSession, dir)
    // Drop stale committer staging from a KILLED previous append first: a
    // dead job's task dirs under `_temporary/<attempt>/task_*` would be
    // merged — resurrected as duplicate rows — by THIS job's commit, since
    // the Hadoop committer reuses the same staging root per output dir
    // (CrashConsistencySpec injects exactly that debris). Safe because the
    // store is single-writer by contract (append is index maintenance, one
    // maintainer per store); readers never see `_`-prefixed paths either way.
    val vecs = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    val fs = vecs.getFileSystem(
      wave.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(vecs, "_temporary"), true)
    KMeansIvf.index(wave, cents)
      .write.mode("append").partitionBy("cluster").parquet(s"$dir/vectors")
  }

  /** Maintenance pass for the append-mode store (the vector twin of the
    * visual index's): every [[append]] wave leaves one more small parquet
    * layer per `cluster=` inverted list, so a 24/7 embedding ingest grows
    * the store's file count linearly and probes pay listing + open cost
    * per layer. Compaction rewrites each inverted-list partition to the
    * byte-size target with the pooled atomic-swap pass — result-invariant
    * (probes read old∪new either way; the row set is untouched) and
    * crash-proven at the leaf swap (CrashConsistencySpec).
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 256L * 1024 * 1024,
      maxParallel: Int = 1): graft.sources.Compaction.Stats =
    graft.sources.Compaction.compactPartitions(spark, s"$dir/vectors",
      targetBytes = targetBytes, maxParallel = maxParallel)

  /** The persisted quantizer (k×dim doubles — driver-sized by design). */
  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/centroids").orderBy("cluster")
      .collect().map(_.getSeq[Double](1).toArray)

  /** Top-k per query against the store. The probed cluster-id set is
    * computed driver-side (bounded by k, the quantizer size — NOT by query
    * or corpus count) and pushed into the scan as a partition filter, so
    * unprobed inverted lists are never read. Ranking is the same
    * broadcast-guarded exact-cosine re-rank as the in-memory
    * [[KMeansIvf.search]] — the two paths return identical rows.
    */
  def probe(queries: DataFrame, dir: String, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = centroids(spark, dir)
    val probed = queries
      .select(explode(org.apache.spark.sql.graftx.VectorExprs
        .nearest_centroids(col("embedding"), cents, nprobe)).as("cluster"))
      .distinct().collect().map(_.getInt(0))
    val vecs = spark.read.parquet(s"$dir/vectors")
      .filter(col("cluster").isin(probed.map(Int.box).toSeq: _*))
    KMeansIvf.search(vecs, queries, cents, k, nprobe)
  }
}
