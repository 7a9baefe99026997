package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Vertica-style PRE-JOIN projection: the fact table stored DENORMALIZED
  * with its dimension, so serving queries never pay the join (the other
  * half of the projection concept next to [[AggProjection]] — Vertica
  * pre-join projections require the join to be key-preserving, which is
  * exactly the fact→dim foreign-key shape this models).
  *
  * `maintain` joins ONLY the new fact batch against the dimension and
  * appends — old fact rows are never re-read, so incremental load cost is
  * batch × dim, not table × dim. The trade (documented by Vertica too):
  * a dimension UPDATE invalidates the store and forces a rebuild — the
  * dimension is the slowly-changing side, so at 100 TB the rebuild is
  * rare while the per-query join saving is constant.
  */
object PrejoinProjection {

  /** Materialize fact ⋈ dim (inner, key-preserving) selecting `cols`. */
  def build(fact: DataFrame, dim: DataFrame, joinExpr: Column,
      cols: Seq[Column], path: String): Unit =
    fact.join(dim, joinExpr).select(cols: _*)
      .write.mode("overwrite").parquet(path)

  /** Fold a NEW fact batch in: join the delta only, append. */
  def maintain(delta: DataFrame, dim: DataFrame, joinExpr: Column,
      cols: Seq[Column], path: String): Unit =
    delta.join(dim, joinExpr).select(cols: _*)
      .write.mode("append").parquet(path)

  def answer(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
