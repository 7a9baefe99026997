package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.RollingHash.rolling_hash

/** Hashed-feature linear model inference — the fastText-style quality
  * classifier shape (Joulin et al., 2016): tokens → hash buckets → weight
  * lookup → sum. The standard way a trained quality/toxicity/lang filter
  * is applied across a 100 TB corpus.
  *
  * Scale shape: the whole scorer is ONE codegen'd projection — token
  * split, per-token hash, weight lookup from an array LITERAL baked into
  * the plan (models are small; corpus is big), and an integer sum, all
  * inside `transform`/`aggregate` higher-order functions. Map-only: no
  * shuffle, no join, no UDF, no broadcast round-trip; scoring throughput
  * is scan throughput.
  *
  * Weights are integers (fixed-point) so document scores are exact and
  * partial-order-independent — which is what lets `q_quality_classifier`
  * be hash-checked against a DuckDB replay rather than eps-compared.
  */
object LinearScorer {

  /** Bucket count — power of 2 so unsigned `mod` is a bit-mask, identical
    * on the signed two's-complement image both engines compute with.
    */
  val Buckets = 1024

  /** Deterministic demo weights in [-1000, 1000]: splitmix64 finalizer
    * over the bucket index (public algorithm, Steele et al. 2014). A real
    * deployment would pass trained weights; every part of the scoring path
    * is weight-agnostic.
    */
  lazy val demoWeights: Array[Long] = {
    def mix(i: Long): Long = {
      var z = i * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      z
    }
    Array.tabulate(Buckets)(i => java.lang.Math.floorMod(mix(i.toLong), 2001L) - 1000L)
  }

  /** Token's weight bucket: low bits of the rolling hash (mask, so the
    * signed image agrees with unsigned mod-2^k in any engine).
    */
  def bucket(token: Column): Column =
    rolling_hash(token).bitwiseAND(lit((Buckets - 1).toLong))

  /** Exact integer score of a single-space-tokenized text column:
    * `sum(weights[bucket(token)])` over its tokens.
    */
  def score(text: Column, weights: Array[Long] = demoWeights): Column = {
    require(weights.length == Buckets, s"need $Buckets weights")
    val w = typedLit(weights.toSeq)
    aggregate(
      transform(split(text, " "),
        t => element_at(w, (bucket(t).cast("int") + 1))),
      lit(0L), (acc, x) => acc + x)
  }

  /** DuckDB replay of [[score]] over a SQL string expression, generated
    * from the same weight array (literal list — the sides cannot drift).
    */
  def scoreSql(textExpr: String, weights: Array[Long] = demoWeights): String = {
    val fold = graft.SketchOracleSql.tokenFoldSql("t")
    val wl = weights.mkString("[", ", ", "]")
    s"""CAST(list_sum(list_transform(string_split($textExpr, ' '),
       |    t -> ($wl)[1 + CAST(($fold) % $Buckets AS INTEGER)])) AS BIGINT)""".stripMargin
  }
}
