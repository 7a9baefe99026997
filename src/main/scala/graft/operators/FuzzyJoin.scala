package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance self-join (record linkage / fuzzy matching).
  *
  * All-pairs Levenshtein is O(n²·m²) and unshardable; the scalable shape is
  * block-then-verify: candidates are generated only WITHIN a caller-chosen
  * block key (an equality join that hash-partitions by block — fully
  * parallel, skew bounded by block cardinality), a length-difference bound
  * prunes pairs before the quadratic distance kernel runs (|len(a)-len(b)|
  * is a lower bound on edit distance, so the prefilter is lossless), and
  * `levenshtein` (codegen'd built-in) verifies the survivors.
  *
  * Blocking is the declared semantics — pairs in different blocks are out
  * of scope by contract (same recall discipline as the MinHash/SimHash
  * banded joins; reference analogue: its dedup is exact GROUP BY only).
  */
object FuzzyJoin {

  /** Distinct values of `valueCol` paired within blocks at edit distance
    * ≤ `maxDist`. Output: (name_a, name_b, dist), name_a < name_b.
    */
  def selfJoin(df: DataFrame, valueCol: String, blockKey: Column => Column,
      maxDist: Int): DataFrame = {
    val names = df.select(col(valueCol).as("name")).distinct()
      .select(col("name"), blockKey(col("name")).as("bk"),
        length(col("name")).as("len"))
    val a = names.select(col("name").as("name_a"), col("bk"),
      col("len").as("len_a"))
    val b = names.select(col("name").as("name_b"), col("bk").as("bk_b"),
      col("len").as("len_b"))
    a.join(b, col("bk") === col("bk_b") &&
        col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }
}
