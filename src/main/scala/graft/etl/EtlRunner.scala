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
      runOne(spark, root, cfg, source)
    }.toMap

  /** [[runAll]] with `maxParallel` tables in flight — what an operator gets
    * on a real cluster by launching several runner processes at once (the
    * per-table `JobLock` already arbitrates exactly that), collapsed into
    * one driver: each table drains on its own thread against its own
    * status store and lock, Spark interleaves the copy jobs' tasks. Tables
    * are fully independent (disjoint status/lock/dest paths by
    * construction), so the only shared state is the SparkSession, which is
    * thread-safe for job submission. Lock semantics are unchanged — a
    * table locked by anyone (including a concurrent sibling thread, were
    * the same table listed twice) is skipped as None, the reference's
    * lock-or-exit (`sqoop_etl.py:52-57`).
    */
  def runAllConcurrent(spark: SparkSession, root: String,
      jobs: Seq[(JobConfig, DataFrame)], maxParallel: Int)
      : Map[String, Option[Seq[Long]]] = {
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, maxParallel))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = jobs.map { case (cfg, source) =>
        new java.util.concurrent.Callable[(String, Option[Seq[Long]])] {
          override def call(): (String, Option[Seq[Long]]) =
            runOne(spark, root, cfg, source)
        }
      }
      // invokeAll: waits for all; a table's failure surfaces on .get()
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
    } finally { pool.shutdown(); () }
  }

  private def runOne(spark: SparkSession, root: String, cfg: JobConfig,
      source: DataFrame): (String, Option[Seq[Long]]) = {
    val lock = new JobLock(spark, s"$root/locks/${cfg.tableName}.lock")
    val result =
      if (!lock.acquire()) None // another runner owns this table (X1)
      else try {
        val store = new StatusStore(spark, s"$root/status/${cfg.tableName}")
        Some(new IncrementalBackup(spark, cfg, store, s"$root/data").run(source))
      } finally lock.release()
    cfg.tableName -> result
  }
}
