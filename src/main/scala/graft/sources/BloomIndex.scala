package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.Sketches

/** Per-file bloom filter index for POINT-lookup file skipping on columns
  * the layout is NOT clustered by — where a min/max manifest ([[StatsStore]])
  * prunes nothing because every file's range covers the whole domain
  * (Delta's bloom filter indexes / Parquet column blooms, built on public
  * Spark primitives).
  *
  * One scan groups `xxhash64(key)` by `input_file_name()` into one bloom
  * blob per file (Spark's BloomFilterAggregate via graftx — partial
  * aggregation merges per-partition filters, so only blobs cross the
  * wire). A point read probes the MANIFEST (one row per file — KBs per TB
  * of data) with the codegen `might_contain`, then opens only possible
  * files. No false negatives: a file containing the key always survives;
  * fpp only costs extra opened files, and the exact predicate is still
  * applied to the rows read (superset guarantee, same as StatsStore).
  */
object BloomIndex {

  /** One (file, bloom) row per data file over `xxhash64(c)`. */
  def build(spark: SparkSession, dataPath: String, c: String,
      expectedPerFile: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    spark.read.parquet(dataPath)
      .select(input_file_name().as("file"), xxhash64(col(c)).as("h"))
      .groupBy(col("file"))
      .agg(Sketches.bloom_agg(col("h"), expectedPerFile, fpp).as("bloom"))
  }

  /** Files that MIGHT contain `key` (no false negatives). The manifest is
    * one row per file, so the probe runs on the collected manifest — the
    * same driver-side file-list discipline as [[StatsStore]]; the hash
    * replayed here (XXH64, seed 42) is exactly what `xxhash64` computed at
    * build time.
    */
  def survivingFiles(index: DataFrame, c: String, key: Long): Seq[String] = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(key, 42L)
    index.select("file", "bloom").collect().iterator
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(r.getAs[Array[Byte]]("bloom")).mightContainLong(h)
      }
      .map(_.getString(0)).toSeq
  }

  /** Point read opening only files whose bloom admits the key; the exact
    * equality predicate is still applied to the rows read.
    */
  def prunedRead(spark: SparkSession, dataPath: String, index: DataFrame,
      c: String, key: Long): DataFrame = {
    val files = survivingFiles(index, c, key)
    val base =
      if (files.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(c) === lit(key))
  }
}
