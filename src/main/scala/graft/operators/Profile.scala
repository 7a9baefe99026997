package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the warehouse ANALYZE_STATISTICS shape (the
  * reference's world runs it before choosing projections/encodings):
  * count / null count / distinct count / min / max per column, one output
  * row each.
  *
  * Two variants with the same schema:
  *
  *  - [[profile]] — EXACT NDV. One aggregate subtree per column, unioned:
  *    each subtree plans a single-column two-stage distinct aggregate
  *    (partial distinct map-side), never the Expand(n+1 copies of every
  *    row) that a multi-column `countDistinct` in one aggregate would
  *    produce. n scans of a columnar source that each read ONE column —
  *    at 100 TB that is n cheap pruned scans, not one 6× row explosion.
  *  - [[profileApprox]] — ONE pass over all columns with
  *    `approx_count_distinct` (HLL, mergeable, no Expand), min/max/counts
  *    identical. This is the default at fact scale; exact NDV is for
  *    oracle parity and small dimensions.
  */
object Profile {

  private val outCols = Seq("col_name", "n_nulls", "n_values", "ndv",
    "min_num", "max_num", "min_str", "max_str")

  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    def one(c: String, numeric: Boolean): DataFrame = {
      val minMax: Seq[Column] =
        if (numeric) Seq(min(col(c)).cast("double").as("min_num"),
          max(col(c)).cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
        else Seq(lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          min(col(c)).as("min_str"), max(col(c)).as("max_str"))
      val aggs = Seq(count(lit(1)).as("__t"), count(col(c)).as("n_values"),
        countDistinct(col(c)).as("ndv")) ++ minMax
      df.select(col(c))
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(c).as("col_name"),
          (col("__t") - col("n_values")).as("n_nulls"),
          col("n_values"), col("ndv"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    (numericCols.map(one(_, numeric = true)) ++
      stringCols.map(one(_, numeric = false)))
      .reduce(_.unionByName(_))
  }

  /** One aggregate pass, approximate NDV (relative sd ~2.5%). */
  def profileApprox(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      numericCols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__n"),
        approx_count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))) ++
      stringCols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__n"),
        approx_count_distinct(col(c)).as(s"${c}__ndv"),
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
        s"AS (${outCols.mkString(", ")})")
  }
}
