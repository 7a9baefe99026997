package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the warehouse ANALYZE_STATISTICS shape (the
  * reference's world runs it before choosing projections/encodings): one
  * aggregate pass computing per-column row count / null count / distinct
  * count / min / max, emitted one row per column.
  *
  * Scale: a single hash-aggregate scan; every statistic is map-side
  * combinable except the exact NDV, which Spark plans via Expand (input
  * ×(n_distinct_aggs)). Exact NDV is kept here for oracle parity; at
  * 100 TB swap `countDistinct` for `approx_count_distinct` — identical
  * plan shape minus the Expand, and the profile stays one pass. No
  * driver-side loops: the per-column unpivot is a `stack` over the single
  * aggregated row.
  */
object Profile {

  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      numericCols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))) ++
      stringCols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).as(s"${c}__smin"),
        max(col(c)).as(s"${c}__smax")))
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val numStack = numericCols.map(c =>
      s"'$c', __total - `${c}__n`, `${c}__n`, `${c}__ndv`, " +
        s"`${c}__min`, `${c}__max`, CAST(NULL AS STRING), CAST(NULL AS STRING)")
    val strStack = stringCols.map(c =>
      s"'$c', __total - `${c}__n`, `${c}__n`, `${c}__ndv`, " +
        s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), `${c}__smin`, `${c}__smax`")
    val n = numericCols.size + stringCols.size
    row.selectExpr(
      s"stack($n, ${(numStack ++ strStack).mkString(", ")}) " +
        "AS (col_name, n_nulls, n_values, ndv, min_num, max_num, min_str, max_str)")
  }
}
