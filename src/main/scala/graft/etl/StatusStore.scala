package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row per (table, partition) backup unit — the reference's
  * `sqoop_etl_status` table (schema inferred from the 8-column insert-select
  * at `/root/reference/sqoop_table.py:143`,`:145`; predicates `:41`,`:107`;
  * update `:62`).
  */
final case class BackupStatus(
    tableName: String,
    hiveDb: String,
    startDate: Timestamp,
    endDate: Option[Timestamp],
    primaryPartitionColumn: String,
    primaryPartitionValue: Long,
    isComplete: Boolean,
    numMappers: Int)

/** Durable job-progress store with the reference's exactly-once semantics
  * (`sqoop_table.py:59-66` relies on Vertica commits; we have no
  * transactional store, so: write the full status set to a temp dir, then
  * atomically swap a `_CURRENT` pointer file — SURVEY §7 "hard parts").
  *
  * The status set is partition-list sized (thousands of rows at most), so
  * full rewrite per update is cheap at any data scale — the fact data is
  * never touched here.
  */
final class StatusStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
  private val root = new org.apache.hadoop.fs.Path(path)
  private val pointer = new org.apache.hadoop.fs.Path(root, "_CURRENT")

  private def currentDir: Option[String] =
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }

  /** Newest COMPLETE generation dir (has `_SUCCESS`), by the timestamp and
    * nonce embedded in the name — the crash-recovery fallback when the
    * pointer file is missing. A kill between `delete(_CURRENT)` and
    * `rename(tmp, _CURRENT)` (the one non-atomic instant of the swap —
    * HDFS rename won't overwrite, so delete-first is forced) previously
    * read as an EMPTY store, which would silently re-pend every partition.
    * In that window the newest complete gen is exactly the set being
    * committed, so rolling forward to it is correct; when the pointer
    * exists it always wins (an uncommitted newer gen must stay invisible).
    */
  private def latestCompleteGen: Option[String] = {
    if (!fs.exists(root)) return None
    val gens = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") &&
        fs.exists(new org.apache.hadoop.fs.Path(root, s"$n/_SUCCESS")))
    if (gens.isEmpty) None
    else Some(gens.maxBy { n =>
      val parts = n.split('-'); (parts(1).toLong, parts(2).toLong)
    })
  }

  /** Read the current status set EAGERLY (collected to the driver, then
    * re-lifted): [[write]] garbage-collects generations beyond
    * current+previous, so a LAZY dataset held across two writes would fail
    * at execution time on deleted parquet files. The status set is tiny by
    * contract (one row per partition unit), so eager materialization is
    * the same driver-side cost the reference pays for its status query
    * (`sqoop_table.py:41`).
    */
  def read(): Dataset[BackupStatus] = currentDir.orElse(latestCompleteGen) match {
    case Some(dir) =>
      val rows = spark.read.parquet(s"$path/$dir").as[BackupStatus]
        .collect().toIndexedSeq
      spark.createDataset(rows)
    case None => spark.emptyDataset[BackupStatus]
  }

  /** Full-set overwrite with atomic pointer swap: readers see either the old
    * or the new complete set, never a partial write (replays are safe —
    * idempotent like the reference's existence-guarded DDL,
    * `sqoop_etl.py:61-75`). Superseded generations are garbage-collected,
    * keeping the current one plus the previous (for a reader that resolved
    * the pointer just before the swap).
    */
  def write(ds: Dataset[BackupStatus]): Unit = {
    val prev = currentDir
    val gen = s"gen-${System.currentTimeMillis()}-${scala.util.Random.nextInt(Int.MaxValue)}"
    ds.coalesce(1).write.mode("overwrite").parquet(s"$path/$gen")
    val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.tmp.$gen")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer, false)
    fs.rename(tmp, pointer)
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val stale = (n.startsWith("gen-") && n != gen && !prev.contains(n)) ||
        (n.startsWith("_CURRENT.tmp.") && n != s"_CURRENT.tmp.$gen")
      if (stale) fs.delete(p, true)
    }
  }

  /** M2: `update sqoop_etl_status set is_complete='t', end_date=now() where
    * table=? and pid=?` (`sqoop_table.py:59-66`) as read-modify-write.
    */
  def markComplete(table: String, pid: Long, at: Timestamp): Unit = {
    val updated = read().map { s =>
      if (s.tableName == table && s.primaryPartitionValue == pid)
        s.copy(isComplete = true, endDate = Some(at))
      else s
    }
    write(updated)
  }

  def append(rows: Seq[BackupStatus]): Unit =
    write(read().union(spark.createDataset(rows)))

  /** M3: `delete from … where key=?` (`sqoop_table.py:68-73`) as
    * filter-and-rewrite (anti-join semantics on the tiny status set).
    */
  def delete(table: String, pid: Long): Unit =
    write(read().filter(s => !(s.tableName == table && s.primaryPartitionValue == pid)))

  /** P5 predicate: pending units for a table (`sqoop_table.py:41`,`:107`). */
  def pending(table: String): Dataset[BackupStatus] =
    read().filter(s => s.tableName == table && !s.isComplete)
}
