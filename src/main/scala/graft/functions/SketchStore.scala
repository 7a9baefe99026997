package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch store (Apache DataSketches HLL, built on
  * Spark's `hll_sketch_agg`/`hll_union_agg`): per-partition sketches are
  * computed ONCE at ingest and persisted as binary columns; any later
  * "distinct over a partition subset" question is answered by unioning the
  * stored sketches — KBs of register arrays — instead of re-scanning the
  * fact data.
  *
  * This is the incremental-stats analogue of the reference's incremental
  * backup: at 100 TB, `COUNT(DISTINCT key)` over an arbitrary month range
  * costs a scan of the sketch table (one row per partition), not a shuffle
  * of the fact table. Register-wise max (the HLL union) is commutative and
  * associative, so estimates are independent of merge order and of how the
  * corpus was split into sketch rows.
  */
object SketchStore {

  /** One mergeable sketch row per group. */
  def build(df: DataFrame, group: Column, key: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(group.as("g"))
      .agg(hll_sketch_agg(key, lit(lgConfigK)).as("sketch"))

  /** Distinct-count estimate for the union of the given sketch rows. */
  def estimateUnion(sketches: DataFrame): DataFrame =
    sketches.agg(
      count(lit(1)).as("n_groups"),
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est"))

  /** Inclusion–exclusion intersection estimate between two sketch subsets:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B). HLL sketches union exactly but
    * can't intersect directly, so the error compounds across the three
    * estimates — the practical tool for "how much do these partitions
    * overlap" when the overlap isn't tiny relative to the union.
    */
  def estimateIntersection(a: DataFrame, b: DataFrame): DataFrame = {
    def est(df: DataFrame, name: String) = df.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as(name))
    est(a, "est_a").crossJoin(est(b, "est_b"))
      .crossJoin(est(a.unionByName(b), "est_union"))
      .withColumn("est_intersection",
        col("est_a") + col("est_b") - col("est_union"))
  }
}
