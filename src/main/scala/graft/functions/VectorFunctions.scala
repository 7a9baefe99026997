package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (`embeddings.embedding: array<float>`).
  *
  * Pure `functions._` compositions (higher-order functions are codegen'd), so
  * a brute-force similarity pass is a single map stage — no UDF serialization,
  * no Python. Floats are widened to double BEFORE any arithmetic and the fold
  * is strictly left-to-right, which makes the result bit-deterministic and
  * reproducible across engines (the DuckDB oracle mirrors the same fold).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-to-right exact-order dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double — native single-pass expression
    * ([[org.apache.spark.sql.graftx.CosineSim]]). Bit-identical to
    * [[cosineHof]] (same widen-then-fold order); kept as the default because
    * it traverses each array once instead of six generic evaluator passes.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.VectorExprs.cosine_sim(a, b)

  /** Reference formulation via higher-order built-ins (equality-tested
    * against [[cosine]]).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Number of sign-hash bits for [[lshBucket]]. 2^8 = 256 buckets. */
  val LshBits = 8

  /** Deterministic random-hyperplane LSH bucket id in [0, 2^LshBits).
    *
    * Hyperplane `h`'s weight for dimension `d` is
    * `(((d*73856093) XOR (h*19349663)) % 7) - 3` — a fixed pseudo-random
    * ±small-int pattern that needs no PRNG state, so the same bucket
    * function is expressible in plain SQL for the oracle and is stable
    * across runs/retries (unlike `rand()`-seeded planes). The xor mixing
    * keeps all `2^LshBits` hyperplanes distinct (a linear `a·d + b·h`
    * pattern is periodic in d and collapses them onto ≤7 directions).
    *
    * At 100 TB this turns the O(n²) similarity self-join into a per-bucket
    * join: hash-partition by bucket, compare only within buckets.
    */
  def lshBucket(vec: Column): Column =
    org.apache.spark.sql.graftx.VectorExprs.lsh_bucket(vec, LshBits)

  /** Deterministic sparse random projection to `outDim` dimensions — the
    * Johnson–Lindenstrauss compression step of an embedding pipeline
    * (Achlioptas-style ±small-int weights). Weight for (dim d, output j) is
    * `(((d*73856093) XOR (j*19349663)) % 7) - 3` — the xor of large-prime
    * multiples decorrelates rows (a plain linear `(a·d + b·j) % 7` has
    * period 7 in d, giving at most 7 distinct directions), while staying
    * PRNG-free: bit-reproducible in plain SQL and stable across retries.
    * Pure codegen'd fold: a map-only pass at any corpus size.
    */
  def randomProjection(vec: Column, outDim: Int): Column = {
    val v = asDouble(vec)
    array((0 until outDim).map { j =>
      aggregate(
        zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
          (x, d) => x * (((d * lit(73856093L)).bitwiseXOR(lit(j * 19349663L)) % lit(7L))
            - lit(3L)).cast("double")),
        lit(0.0),
        (acc, x) => acc + x)
    }: _*)
  }

  /** Reference formulation via higher-order built-ins (equality-tested
    * against [[lshBucket]]).
    */
  def lshBucketHof(vec: Column): Column = {
    val v = asDouble(vec)
    val bits = (0 until LshBits).map { h =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * (((d * lit(73856093L)).bitwiseXOR(lit(h * 19349663L)) % lit(7L))
            - lit(3L)).cast("double")),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= lit(0.0), lit(1L << h)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
