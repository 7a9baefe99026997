package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replica reconciliation by bucket checksums — the 100 TB version of the
  * reference's post-copy validation (sqoop_etl.py counts rows after each
  * partition copy; a rowcount can't see a corrupted value or a swapped
  * row). Comparing two 100 TB replicas row-by-row is a full-table shuffle
  * of both sides; the anti-entropy discipline (Merkle-style, as in
  * Cassandra repair / DynamoDB sync) compares per-bucket digests first and
  * ships rows ONLY for the buckets that disagree:
  *
  *  1. each side: one map-side-combinable aggregate → (bucket, count,
  *     fingerprint-xor), `nBuckets` rows total — broadcast-sized however
  *     big the tables are;
  *  2. buckets whose (count, xor) agree are PROVEN identical (up to the
  *     2^-60 xor-collision odds) and never ship a row;
  *  3. only mismatched buckets' rows enter the row-level full outer join,
  *     classified only_left / only_right / changed.
  *
  * With corruption localized (the practical case: a lost partition file, a
  * bad batch), stage 3 touches a vanishing fraction of the table.
  */
object Reconcile {

  /** 60-bit row fingerprint: leading 15 hex digits of md5 over the
    * canonical `|`-joined column rendering (integers/strings — callers
    * quantize doubles first so the rendering is engine-portable).
    */
  def fingerprint(cols: Column*): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10).cast("long")

  private def summarize(side: DataFrame, nBuckets: Int): DataFrame =
    side.groupBy((col("key") % nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"), expr("bit_xor(fp)").as("xr"))

  /** Per-bucket digest comparison of two (key, fp) replicas: returns the
    * mismatched buckets only (empty ⇔ replicas identical).
    */
  def bucketDiff(left: DataFrame, right: DataFrame, nBuckets: Int): DataFrame = {
    val l = summarize(left, nBuckets)
    val r = summarize(right, nBuckets)
      .withColumnsRenamed(Map("cnt" -> "rcnt", "xr" -> "rxr"))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(!(col("cnt") <=> col("rcnt")) || !(col("xr") <=> col("rxr")))
      .select(col("bucket"))
  }

  /** Converge the replica: drop rows the source doesn't have, take the
    * source's version of missing/changed rows. `leftFull`/`rightFull` are
    * the full-row tables (any payload columns) keyed by `key`; `diffs` is
    * [[rowDiff]]'s output. Ships only diff keys + their source rows — the
    * repair volume is the damage volume, never the table volume. A second
    * [[bucketDiff]] over the repaired replica returning zero rows closes
    * the anti-entropy loop (asserted in OperatorsSpec).
    */
  def repair(leftFull: DataFrame, rightFull: DataFrame,
      diffs: DataFrame): DataFrame = {
    val drop = diffs.filter(col("kind") === "only_right" ||
      col("kind") === "changed").select("key")
    val take = diffs.filter(col("kind") === "only_left" ||
      col("kind") === "changed").select("key")
    rightFull.join(drop, Seq("key"), "left_anti")
      .unionByName(leftFull.join(take, Seq("key"), "left_semi"))
  }

  /** Row-level diff restricted to the mismatched buckets: (kind, key) with
    * kind ∈ only_left / only_right / changed.
    */
  def rowDiff(left: DataFrame, right: DataFrame, nBuckets: Int): DataFrame = {
    val bad = bucketDiff(left, right, nBuckets)
    def scoped(side: DataFrame) = side
      .withColumn("bucket", col("key") % nBuckets)
      .join(bad, Seq("bucket"), "left_semi")
    val l = scoped(left).withColumnsRenamed(Map("key" -> "lkey", "fp" -> "lfp"))
    val r = scoped(right).withColumnsRenamed(Map("key" -> "rkey", "fp" -> "rfp"))
    l.join(r, col("lkey") === col("rkey"), "full_outer")
      .select(
        when(col("rkey").isNull, lit("only_left"))
          .when(col("lkey").isNull, lit("only_right"))
          .when(col("lfp") =!= col("rfp"), lit("changed")).as("kind"),
        coalesce(col("lkey"), col("rkey")).as("key"))
      .filter(col("kind").isNotNull)
  }
}
