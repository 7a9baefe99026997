package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Distributed dense surrogate-key assignment — the scale-correct
  * replacement for the reference's Vertica sequence / `nextval` pattern
  * (SURVEY §2.8 F4; `vsql_table.py` relies on the database handing out
  * contiguous ids). A dimension build needs every distinct term mapped to
  * a dense, stable id 0..n-1; the naive Spark spelling is
  * `row_number() OVER (ORDER BY term)` — a single-partition global window,
  * the exact SURVEY §7 hazard.
  *
  * This operator instead range-partitions the sorted distinct terms and
  * computes ids as per-partition offsets + local index (the `zipWithIndex`
  * shape): one tiny extra job to count partition sizes (numPartitions
  * longs to the driver, never rows), then a map-only id stamp. Every
  * partition works independently — the 1000-executor plan has no
  * single-task stage at all.
  *
  * `extend` keeps ids STABLE under incremental loads (the sequence
  * semantics): existing assignments never change, new terms get ids
  * continuing after the current max (a 1-row driver-side aggregate, same
  * bounded discipline as IncrementalBackup's partition lists).
  */
object DictEncode {

  private val outSchema = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Dense contiguous ids 0..n-1 in lexicographic term order. Null/empty
    * terms are excluded (no dictionary entry for absent values).
    */
  def build(terms: DataFrame, termCol: String): DataFrame = {
    val spark = terms.sparkSession
    val distinct = terms
      .select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .distinct()
    // sortBy range-partitions; zipWithIndex adds one count job for the
    // per-partition offsets, then stamps ids map-side
    val indexed = distinct.rdd
      .map(_.getString(0))
      .sortBy(identity)
      .zipWithIndex()
      .map { case (t, i) => Row(t, i) }
    spark.createDataFrame(indexed, outSchema)
  }

  /** Extend `dict` with terms from `newTerms` it doesn't already hold.
    * Existing ids are untouched; fresh terms continue after max(id), dense
    * and lexicographically ordered among themselves.
    */
  def extend(dict: DataFrame, newTerms: DataFrame, termCol: String): DataFrame = {
    val fresh = newTerms
      .select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .distinct()
      .join(dict.select("term"), Seq("term"), "left_anti")
    val next = dict.agg(coalesce(max(col("id")), lit(-1L)).as("m"))
      .head().getLong(0) + 1
    dict.unionByName(
      build(fresh, "term").withColumn("id", col("id") + lit(next)))
  }

  /** Encode a column of a fact table through the dictionary (broadcast when
    * the dict is small enough, else a plain equi-join on the term).
    */
  def encode(facts: DataFrame, dict: DataFrame, termCol: String): DataFrame =
    facts.join(dict.withColumnRenamed("term", termCol), Seq(termCol), "left")
}
