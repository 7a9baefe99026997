package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark lacks natively.
  *
  * Implemented by composing built-ins (preference (a) from the build rules):
  * tag and union both sides, sort within each key by (time, side), and carry
  * the latest right-side values forward with `last(..., ignoreNulls)` over a
  * running window; keep only left rows. This is exactly one shuffle on the
  * key + one in-partition sort — the same cost envelope as a sort-merge
  * join, with no broadcast requirement, so it scales to 100 TB fact/fact
  * joins (state per partition is a single row of right-side values).
  *
  * Tie rule: a right row at time t is visible to left rows at the same t
  * (`left.t >= right.t`), matching DuckDB's ASOF JOIN, which the oracle uses.
  * `rightCols` must be unique per (key, time) for determinism — pre-aggregate
  * the right side if necessary.
  */
object AsofJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     build side, projected to key/time/rightCols
    * @param key       equality key column present on both sides
    * @param time      ordering column (same name both sides, numeric or
    *                  timestamp)
    * @param rightCols right-side payload columns to carry (null when no
    *                  right row is at or before the left row)
    */
  def apply(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("_side", lit(1))
      .select((Seq(col(key), col(time), col("_side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))): _*)
    val taggedRight = right
      .withColumn("_side", lit(0))
      .select((Seq(col(key), col(time), col("_side")) ++
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"_r_$c"))): _*)
    // right (_side=0) sorts before left (_side=1) at equal time → visible
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .select((Seq(col(key), col(time), col("_side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        rightCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_r_$c"))): _*)
    carried
      .filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col(s"_r_$c").as(s"asof_$c"))): _*)
  }
}

/** Skew-salted equi-join: the 100 TB discipline for hot keys.
  *
  * The big side gets a deterministic salt derived from a disambiguating
  * column (NOT `rand()` — retries must reproduce); the small side is
  * replicated `salts` times. The join key becomes (key, salt), splitting a
  * hot key's rows across `salts` reducers. AQE's skew-join handles moderate
  * skew automatically; this is the explicit tool for pathological keys.
  */
object SaltedJoin {
  def apply(big: DataFrame, small: DataFrame, key: String, tieBreak: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(col(tieBreak)), lit(salts)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
