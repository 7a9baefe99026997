package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (range) join: pair left rows with right rows whose time lies in
  * `[leftTime + lowerSec, leftTime + upperSec)`, with optional equality keys.
  *
  * Spark plans a raw inequality join as a broadcast-nested-loop — quadratic
  * work and a broadcast requirement, both fatal at 100 TB. This operator
  * manufactures the missing equi-key: bucket time at the band width
  * `W = upper - lower`. A left row's admissible window has length exactly W,
  * so it intersects at most two consecutive right buckets — the left side is
  * exploded to those two probes, the join is a plain shuffled hash join on
  * (keys, bucket), and the exact band predicate filters residuals. Cost:
  * one shuffle per side on (keys, bucket), output identical to the naive
  * theta join.
  */
object RangeJoin {

  /** @param left      probe side; its time column stays in the output
    * @param right     side being ranged over; must not share column names
    *                  with `left` other than `keys`
    * @param keys      equality key columns present on both sides
    * @param leftTime  timestamp column on `left`
    * @param rightTime timestamp column on `right` (distinct name)
    * @param lowerSec  inclusive lower band offset in seconds (may be negative)
    * @param upperSec  exclusive upper band offset in seconds; > lowerSec
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec > lowerSec, "band must be non-empty")
    require(leftTime != rightTime, "time columns must have distinct names")
    val w = (upperSec - lowerSec) * 1000000L
    val lb = floor((unix_micros(col(leftTime)) + lit(lowerSec * 1000000L))
      / lit(w)).cast("long")
    val probes = left.withColumn("_bucket", explode(array(lb, lb + lit(1L))))
    val bucketed = right.withColumn("_bucket",
      floor(unix_micros(col(rightTime)) / lit(w)).cast("long"))
    val band: Column =
      unix_micros(col(rightTime)) >=
        unix_micros(col(leftTime)) + lit(lowerSec * 1000000L) &&
      unix_micros(col(rightTime)) <
        unix_micros(col(leftTime)) + lit(upperSec * 1000000L)
    probes.join(bucketed, keys :+ "_bucket")
      .filter(band)
      .drop("_bucket")
  }
}
