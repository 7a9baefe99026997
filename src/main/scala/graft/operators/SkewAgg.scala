package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for pathologically skewed group keys.
  *
  * Spark's map-side partial aggregation already absorbs most key skew — the
  * hot key's rows collapse per map task before shuffling. The case it can't
  * absorb is a MERGE-heavy aggregate (collect-style or high-cardinality
  * intermediate state) or an extreme hot key whose partial rows still swamp
  * one reducer. Salting splits each key into `salts` sub-keys for the first
  * aggregate (fan-out bounded by salts × keys), then a second, tiny
  * aggregate over (key) merges the salt partials. Both aggregates are
  * ordinary hash aggregates; the salt is a deterministic function of a
  * tie-break column, so task retries reproduce identical assignments
  * (the same discipline as [[SaltedJoin]]).
  */
object SkewAgg {

  /** Exact decimal sum + count of `valueCol` per `key`, aggregated through
    * `salts` deterministic sub-keys. Semantically identical to the direct
    * `groupBy(key).agg(...)` — the salt never changes results, only the
    * shuffle's key fan-out.
    */
  def sumCount(df: DataFrame, key: Column, valueCol: Column, saltFrom: Column,
      salts: Int): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), pmod(xxhash64(saltFrom), lit(salts)).as("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(valueCol.cast("decimal(18,4)")).as("_sum"))
    partial.groupBy(col("key"))
      .agg(sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("total"))
  }
}
