package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout: cluster rows so that BOTH of two
  * predicate columns get tight per-file min/max ranges, enabling file- and
  * row-group-level skipping for predicates on either column — where a linear
  * sort only helps its leading column.
  *
  * The z-value is a 32-bit Morton code: each column is range-scaled to 16
  * bits, then the bits are interleaved. All pure column expressions inside
  * whole-stage codegen; the only extra pass is one min/max aggregate to get
  * the scaling bounds. The write is `repartitionByRange` on the z-value
  * (range exchange = one shuffle, same as any global sort) + an in-partition
  * sort, so files tile the curve.
  */
object ZOrder {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd). */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Morton code of two numeric columns scaled to [0, 65535] by the given
    * bounds (compute bounds once with a min/max aggregate).
    */
  def zvalue(x: Column, xMin: Long, xMax: Long,
      y: Column, yMin: Long, yMax: Long): Column = {
    def scale(c: Column, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo, 1L)
      ((c.cast("long") - lit(lo)) * lit(65535L) / lit(span)).cast("long")
    }
    interleave16(scale(x, xMin, xMax), scale(y, yMin, yMax))
  }

  /** Write `df` z-ordered on two numeric columns. `numFiles` bounds the
    * range-partition count (file count ≈ numFiles; small-file avoidance as
    * with the ORC sink's numMappers knob).
    */
  def write(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int, format: String = "parquet"): Unit = {
    val b = df.agg(min(col(c1)), max(col(c1)), min(col(c2)), max(col(c2)))
      .head()
    def lv(i: Int): Long = b.getAs[Number](i).longValue
    val z = zvalue(col(c1), lv(0), lv(1), col(c2), lv(2), lv(3))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").format(format).save(path)
  }
}
