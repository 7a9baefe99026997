package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame programs for every query shape the reference generates
  * (SURVEY.md §2 / §3.2). Each method maps one generated-SQL pattern from
  * `/root/reference/sqoop_table.py` to its idiomatic Spark plan.
  *
  * Scale notes baked in:
  *  - The global (unpartitioned) `row_number` window only ever runs on the
  *    DISTINCT partition list (thousands of rows), never on fact data —
  *    same discipline as the reference, which ranks partition values only
  *    (`sqoop_table.py:145`).
  *  - Anti-joins against the status table broadcast the status side (tiny).
  */
object ReferenceOps {

  /** month_sid derivation: the testdata stand-in for the reference's
    * monthly partition column (`agg_geo_lucid_daily.yaml:4` PRIMARY_ID).
    * yyyymm as long, e.g. 199501.
    */
  def monthSid(ts: Column): Column =
    (year(ts) * lit(100) + month(ts)).cast("long")

  /** §3.2 partition-discovery: DISTINCT pid → row_number() OVER (ORDER BY pid
    * DESC) → rn > skipLatest → NOT EXISTS(status). Mirrors the INSERT-SELECT
    * at `sqoop_table.py:145` (operators A2+W1+P6+J1).
    *
    * `warehouse` is the fact table; `status` holds already-recorded partition
    * values in column `month_sid`. The distinct runs on the fact table (one
    * shuffle, map-side partial dedup); everything after operates on the tiny
    * partition list, so the single-partition window is safe at any scale.
    */
  def discoverPendingPartitions(
      warehouse: DataFrame, pid: Column, status: DataFrame, skipLatest: Int): DataFrame = {
    val discovered = warehouse.select(pid.as("month_sid")).distinct()
    val ranked = discovered.withColumn(
      "rn", row_number().over(Window.orderBy(col("month_sid").desc)))
    ranked
      .filter(col("rn") > lit(skipLatest))
      .join(broadcast(status.select(col("month_sid"))), Seq("month_sid"), "left_anti")
      .select(col("month_sid"))
  }

  /** O1: oldest pending partition — ORDER BY pid LIMIT 1
    * (`sqoop_table.py:41`,`:50`). Catalyst plans TakeOrderedAndProject:
    * per-partition top-1 then a driver-side merge of 1-row candidates —
    * no global sort even at 100 TB.
    */
  def oldestPending(pending: DataFrame): DataFrame =
    pending.orderBy(col("month_sid")).limit(1)

  /** A1: partition row-count verification — `select count(*) where pid = v`
    * (`sqoop_table.py:54-57`). The equality filter is pushed into the scan.
    */
  def partitionRowCount(warehouse: DataFrame, pid: Column, value: Long): DataFrame =
    warehouse.filter(pid === lit(value)).agg(count(lit(1)).as("cnt"))

  /** A2/A3: distinct partition enumeration (`sqoop_table.py:145` inner query). */
  def distinctPartitions(warehouse: DataFrame, pid: Column): DataFrame =
    warehouse.select(pid.as("month_sid")).distinct()

  /** P2/F2: synthetic round-robin bucket id — the Spark-native stand-in for
    * `SEQ.nextval % NUM_MAPPERS` (`sqoop_table.py:97`). Derived from a stable
    * key, NOT `monotonically_increasing_id`, so it is deterministic across
    * task retries (SURVEY §7 "hard parts").
    */
  def bucketId(key: Column, numBuckets: Int): Column = pmod(key, lit(numBuckets))

  /** Bucket histogram: how even is the synthetic split? (What the reference's
    * boundary-query machinery assumed, `sqoop_json.py:31`.)
    */
  def bucketHistogram(df: DataFrame, key: Column, numBuckets: Int): DataFrame =
    df.groupBy(bucketId(key, numBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** P3/F1: `column_name || ' ' || data_type` DDL-fragment projection
    * (`sqoop_table.py:125`), generalized to a concat projection over a
    * broadcast dim join.
    */
  def concatProjection(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), concat(col("n_name"), lit(" "), col("r_name")).as("ddl"))

  /** J1/J2: NOT EXISTS anti-join (`sqoop_table.py:143`,`:145`) — rows in
    * `left` with no match in `right` on `key`.
    */
  def notExists(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_anti")

  /** O4: existence probe — `select 1 from … limit 1` (`sqoop_table.py:106-112`). */
  def exists(df: DataFrame): Boolean = !df.isEmpty
}
