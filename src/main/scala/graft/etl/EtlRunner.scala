package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.JobLock

/** X5: sequential multi-table run with per-table locking — the analogue of
  * `run_sqoop_job.sh:15-25` driving 6 fact configs + 1 dim config. Tables
  * run sequentially like the reference; each table's copy is internally
  * parallel (numMappers-way). Returns per-table copied partitions; locked
  * tables are skipped (None), mirroring the reference's lock-or-exit.
  */
object EtlRunner {

  def runAll(spark: SparkSession, root: String,
      jobs: Seq[(JobConfig, DataFrame)]): Map[String, Option[Seq[Long]]] =
    jobs.map { case (cfg, source) =>
      val lock = new JobLock(spark, s"$root/locks/${cfg.tableName}.lock")
      val result =
        if (!lock.acquire()) None // another runner owns this table (X1)
        else try {
          val store = new StatusStore(spark, s"$root/status/${cfg.tableName}")
          Some(new IncrementalBackup(spark, cfg, store, s"$root/data").run(source))
        } finally lock.release()
      cfg.tableName -> result
    }.toMap
}
