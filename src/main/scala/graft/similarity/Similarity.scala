package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`embeddings.embedding: array<float>`). North-star addition — the
  * reference has no vector surface.
  *
  * Scale shape: `queries` is the small side (a probe set) and is broadcast;
  * `corpus` is the 100 TB side and is only ever scanned map-style. Ranking
  * uses a window partitioned BY QUERY (bounded cardinality), never a global
  * sort.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors per query vector.
    * Broadcast(queries) × corpus → per-query top-k. The cross join is
    * |queries| * |corpus| map work with no shuffle of the corpus; the only
    * shuffle is the per-query top-k aggregation.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** LSH-bucketed ANN: probe only the corpus rows whose deterministic
    * random-hyperplane bucket matches the query's bucket. Recall < 1 traded
    * for touching 1/2^bits of the corpus per probe; bucket is precomputable
    * and partition-prunable when the corpus is written bucketed.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
      lshBucket(col("embedding")).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      lshBucket(col("embedding")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** IVF-style ANN: k-means-free variant using LSH buckets as the inverted
    * lists; `nprobe` neighboring buckets (Hamming-adjacent) are probed per
    * query for higher recall.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      lshBucket(col("embedding")).as("bucket"))
    // probe list: own bucket + single-bit flips (Hamming-1 neighbors), first nprobe
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
      lshBucket(col("embedding")).as("qb"))
      .withColumn("bucket", explode(slice(concat(
        array(col("qb")),
        transform(sequence(lit(0), lit(LshBits - 1)),
          b => col("qb").bitwiseXOR(call_function("shiftleft", lit(1L), b)))), 1, nprobe)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** Per-vector int8 scalar quantization: `q_i = round(x_i * 127 / max|x|)`.
    * 4× smaller than float32 and the similarity math becomes exact integer
    * dot products — unlike float sums, bit-identical in any engine and any
    * order, so SQ search is fully oracle-checkable. The scale rides along
    * for (optional) dequantization.
    */
  def quantizeInt8(vec: Column): Column = {
    val s = array_max(transform(vec, x => abs(x.cast("double"))))
    transform(vec, x => round(x.cast("double") * lit(127.0) / s).cast("int"))
  }

  /** Top-k by quantized cosine: integer dot products (exact, order-free)
    * with double normalization at the end. The corpus scan reads int8-scale
    * codes — the simple cousin of PQ-ADC with zero training.
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def idot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v)
    val q = queries.select(col("vec_id").as("query_id"),
      quantizeInt8(col("embedding")).as("qq"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      quantizeInt8(col("embedding")).as("cq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        idot(col("qq"), col("cq")).cast("double") /
          (sqrt(idot(col("qq"), col("qq")).cast("double")) *
            sqrt(idot(col("cq"), col("cq")).cast("double"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= lit(k))
      .select(col("query_id"), col("neighbor_id"),
        col("qcos"), col("rk").cast("long").as("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-blocked —
    * the vector analogue of MinHash near-dup (same-bucket pairs only).
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double): DataFrame = {
    val keyed = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding")).as("bucket"))
    val a = keyed.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = keyed.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= lit(threshold))
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
