package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the streaming-friendly heavy-hitter
  * / frequency-estimate structure (Cormode & Muthukrishnan 2005): `depth`
  * hash rows × `width` counters; estimate = min over rows of the counter
  * each row hashes the key to. Overestimates only: est ≥ true always, and
  * est ≤ true + (e/width)·N with probability 1−e^−depth per key.
  *
  * Build shape (scale-first): ONE heavy pass — `groupBy(key).count()`
  * with map-side partial aggregation — followed by `depth` aggregations
  * over the (already tiny) vocabulary into `width` buckets. Nothing but
  * (key, count) pairs ever shuffles; the sketch itself is depth×width longs
  * (a 4×1024 sketch is 32 KiB) and is the only thing the driver collects.
  * The same shape holds at 100 TB: the vocab aggregation is the classic
  * word-count, and the sketch size is constant.
  *
  * Hashing: `xxhash64(seed_i, key)` — Spark's codegen'd 64-bit hash with
  * the row index as seed column, reproducible anywhere xxhash64 exists.
  */
object CountMin {

  final case class Sketch(depth: Int, width: Int,
      tables: Array[Array[Long]], total: Long)

  def bucket(key: Column, row: Int, width: Int): Column =
    pmod(xxhash64(lit(row), key), lit(width)).cast("int")

  /** Build from pre-aggregated (key, n) counts — the vocab-level path. */
  def fromCounts(counts: DataFrame, key: String, n: String,
      depth: Int, width: Int): Sketch = {
    val total = counts.agg(sum(col(n)).cast("long")).head().getLong(0)
    val tables = (0 until depth).map { r =>
      val t = new Array[Long](width)
      counts
        .groupBy(bucket(col(key), r, width).as("b"))
        .agg(sum(col(n)).cast("long").as("c"))
        .collect()
        .foreach(row => t(row.getInt(0)) = row.getLong(1))
      t
    }.toArray
    Sketch(depth, width, tables, total)
  }

  /** Build from raw rows (one increment per row). */
  def fit(rows: DataFrame, key: String, depth: Int, width: Int): Sketch =
    fromCounts(rows.groupBy(col(key)).agg(count(lit(1)).as("n")),
      key, "n", depth, width)

  /** Point estimate for `key` against a collected sketch: min over rows of
    * the hashed counter. Pure codegen lookup (array literal + element_at) —
    * usable in joins/filters without the sketch leaving the executors.
    */
  def estimate(sketch: Sketch, key: Column): Column =
    least((0 until sketch.depth).map { r =>
      element_at(typedLit(sketch.tables(r).toSeq),
        bucket(key, r, sketch.width) + lit(1))
    }: _*)

  /** ε-bound for the overestimate: (e/width)·N rounded up — the classic CMS
    * guarantee with probability 1−e^−depth per key.
    */
  def errorBound(sketch: Sketch): Long =
    math.ceil(math.E / sketch.width * sketch.total).toLong
}
