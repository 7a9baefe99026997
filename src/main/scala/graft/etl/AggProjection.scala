package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Vertica-style aggregate projection: a materialized partial-aggregate of
  * a fact table that answers matching GROUP BY queries without touching
  * the facts (the reference system's core storage concept — pre-aggregated
  * projections — re-expressed as a parquet partial-state store).
  *
  * The stored state is MERGEABLE: per group, a row count and exact decimal
  * sums. `maintain` APPENDS the partials of a new fact batch (never
  * re-reads old facts — incremental view maintenance), and `answer`
  * re-aggregates the partial rows, which are ~|groups| × batches, not
  * |facts|. At 100 TB the projection is GBs and every matching query
  * becomes a scan of it.
  *
  * Reference: Vertica projections (SURVEY.md §1); same partial-merge
  * discipline as the HLL/KLL sketch stores.
  */
object AggProjection {

  private def partials(fact: DataFrame, groupCols: Seq[String],
      measures: Seq[String]): DataFrame =
    fact.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        measures.map(m => sum(Exact.dec(col(m))).as(s"__sum_$m")): _*)

  /** Materialize the projection for an initial fact batch. */
  def build(fact: DataFrame, groupCols: Seq[String], measures: Seq[String],
      path: String): Unit =
    partials(fact, groupCols, measures)
      .write.mode("overwrite").parquet(path)

  /** Fold a NEW fact batch into the projection: append its partials only —
    * no old facts are read, no rewrite of existing state.
    */
  def maintain(delta: DataFrame, groupCols: Seq[String], measures: Seq[String],
      path: String): Unit =
    partials(delta, groupCols, measures)
      .write.mode("append").parquet(path)

  /** Answer the projected GROUP BY from stored partials: counts add, exact
    * decimal sums add — the merge is associative so batch boundaries can't
    * change the result. Output: group cols, `cnt`, `sum_<m>` (double).
    */
  def answer(spark: SparkSession, path: String, groupCols: Seq[String],
      measures: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        measures.map(m =>
          sum(col(s"__sum_$m")).cast("double").as(s"sum_$m")): _*)
}
