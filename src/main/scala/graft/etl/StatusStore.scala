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

  def read(): Dataset[BackupStatus] = currentDir match {
    case Some(dir) => spark.read.parquet(s"$path/$dir").as[BackupStatus]
    case None => spark.emptyDataset[BackupStatus]
  }

  /** Full-set overwrite with atomic pointer swap: readers see either the old
    * or the new complete set, never a partial write (replays are safe —
    * idempotent like the reference's existence-guarded DDL,
    * `sqoop_etl.py:61-75`).
    */
  def write(ds: Dataset[BackupStatus]): Unit = {
    val gen = s"gen-${System.currentTimeMillis()}-${scala.util.Random.nextInt(Int.MaxValue)}"
    ds.coalesce(1).write.mode("overwrite").parquet(s"$path/$gen")
    val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.tmp.$gen")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer, false)
    fs.rename(tmp, pointer)
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
