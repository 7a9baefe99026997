package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: a rule set compiled into the minimum
  * number of passes over the table.
  *
  * The reference pipeline's only integrity device is its status table (one
  * row per copied partition); production tables feeding a 100 TB training
  * run need explicit contracts — null-free keys, unique ids, enum domains,
  * value ranges, referential integrity — checked continuously and cheaply.
  *
  * Compilation strategy, sized for 100 TB:
  *  - All scalar rules ([[DataChecks.NotNull]], [[DataChecks.InSet]],
  *    [[DataChecks.InRange]], [[DataChecks.Unique]]) fold into ONE aggregate
  *    pass: each rule is a conditional `sum` (map-side partial-agg'd), and
  *    uniqueness rides the same pass as `count(col) - count(distinct col)`.
  *    One scan, one shuffle of a single row.
  *  - Each [[DataChecks.ForeignKey]] adds one anti-join against the
  *    DISTINCT key projection of its dimension — broadcast when small (the
  *    usual case for dimension keys), shuffled hash otherwise; either way
  *    only the key column of the fact travels.
  *
  * Output: one row per rule — `(check_name, violations, total, pass)` —
  * small enough to alert on, join into a run ledger, or gate a pipeline.
  */
object DataChecks {

  sealed trait Rule { def name: String }

  /** Column must contain no NULLs. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null_$column"
  }

  /** Non-null values must come from the allowed enum domain. */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set_$column"
  }

  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range_$column"
  }

  /** Non-null values must be distinct (violations = extra duplicates). */
  final case class Unique(column: String) extends Rule {
    val name = s"unique_$column"
  }

  /** Non-null values must exist in `dim(dimColumn)`. */
  final case class ForeignKey(column: String, dim: DataFrame, dimColumn: String)
      extends Rule {
    val name = s"fk_$column"
  }

  /** Violation counter for one scalar rule, as an aggregate expression. */
  private def violationAgg(r: Rule): Column = r match {
    case NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case InSet(c, allowed) =>
      sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L).otherwise(0L))
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi)), 1L)
        .otherwise(0L))
    case Unique(c) =>
      // duplicates among non-null values; count(col) already skips nulls
      count(col(c)) - countDistinct(col(c))
    case _: ForeignKey =>
      throw new IllegalArgumentException("FK rules compile to joins")
  }

  /** Run the audit; returns `(check_name, violations, total, pass)`, one row
    * per rule, ordered by check name.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val scalars = rules.filter(!_.isInstanceOf[ForeignKey])
    val fks = rules.collect { case f: ForeignKey => f }
    require(scalars.nonEmpty, "at least one scalar rule required")

    // one pass: total + every scalar rule's violation count
    val aggRow = df.agg(
      count(lit(1)).as("_total"),
      scalars.map(r => violationAgg(r).cast("long").as(r.name)): _*)

    // melt the single row to (check_name, violations), keeping total
    val pairs = scalars.flatMap(r => Seq(lit(r.name), col(r.name)))
    val scalarRows = aggRow.select(
      explode(map(pairs: _*)).as(Seq("check_name", "violations")),
      col("_total").as("total"))

    // FK rules: anti-join on the distinct dim keys; total rides along from
    // the (1-row) scalar aggregate via a broadcast cross join
    val totalRow = aggRow.select(col("_total").as("total"))
    val fkRows = fks.map { f =>
      df.select(col(f.column)).filter(col(f.column).isNotNull)
        .join(f.dim.select(col(f.dimColumn).as(f.column)).distinct(),
          Seq(f.column), "left_anti")
        .agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(f.name).as("check_name"), col("violations"))
        .crossJoin(broadcast(totalRow))
    }

    (scalarRows +: fkRows).reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === lit(0L))
      .orderBy("check_name")
  }
}
