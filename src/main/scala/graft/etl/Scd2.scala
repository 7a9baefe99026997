package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 build: a change log (key, attribute,
  * timestamp) becomes a versioned dimension with validity intervals —
  * the warehouse-side complement of the reference's monthly re-extract
  * discipline (it re-copies whole partitions, `sqoop_etl.py:61-72`; an SCD2
  * dimension is how the receiving warehouse tracks what changed).
  *
  * Two windows, both partitioned by the business key — per-key history is
  * bounded (change counts, not fact volume), so no global sort and no skew
  * beyond the hottest key's change count. Consecutive rows with an
  * unchanged attribute are collapsed FIRST (run-length semantics: a new
  * version opens only when the value actually changes), then validity is
  * `[valid_from, lead(valid_from))`, open-ended for the current version.
  */
object Scd2 {

  /** @param tieBreak extra ordering columns to make same-timestamp change
    *                 order deterministic (e.g. a change-log sequence id)
    */
  def build(changes: DataFrame, keyCols: Seq[String], attrCol: String,
      tsCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val key = keyCols.map(col)
    val ord: Seq[Column] = (tsCol +: tieBreak).map(col)
    val wOrd = Window.partitionBy(key: _*).orderBy(ord: _*)
    val changed = changes
      .withColumn("_prev", lag(col(attrCol), 1).over(wOrd))
      // null-safe: a NULL→value or value→NULL transition is a real change
      .filter(!(col(attrCol) <=> col("_prev")))
      .drop("_prev")
    val wVer = Window.partitionBy(key: _*).orderBy(ord: _*)
    changed
      .withColumn("version", row_number().over(wVer).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wVer))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ Seq(col(attrCol), col("version"),
        col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
