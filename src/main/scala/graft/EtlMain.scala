package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{EtlRunner, JobConfig}
import graft.operators.ReferenceOps

/** The runnable analogue of the reference's whole deployment —
  * `run_sqoop_job.sh` driving the per-table YAML configs through the
  * incremental-backup loop. A reference user's invocation maps 1:1:
  *
  * {{{
  * runMain graft.EtlMain <sfDir> <workRoot> [table[:primaryIdOff] ...]
  * }}}
  *
  * With no table args it runs the reference's exact shape: monthly-
  * partitioned fact tables sequentially (orders, lineitem — the testdata's
  * facts), then a full-snapshot dim (customer — the `advertiser_dim.yaml`
  * path with `PRIMARY_ID: ""`). Re-running resumes idempotently: completed
  * partitions are discovered via the status store's NOT-EXISTS anti-join
  * and skipped, exactly like the reference's restart behavior.
  *
  * Exit code 0 = every table ran (or was cleanly lock-skipped); the
  * per-table copied-partition counts print as one JSON line for
  * scripting, mirroring how the shell wrapper consumed sqoop's output.
  */
object EtlMain {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-etl").toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = Tables.orders(spark, sfDir)
      .withColumn("month_sid", ReferenceOps.monthSid(col("o_orderdate")))
    val lineitem = Tables.lineitem(spark, sfDir)
      .withColumn("month_sid", ReferenceOps.monthSid(col("l_shipdate")))
    val customer = Tables.customer(spark, sfDir)

    val jobs = Seq(
      JobConfig("orders") -> orders,
      JobConfig("lineitem") -> lineitem,
      JobConfig("customer", primaryId = "") -> customer) // dim: full snapshot

    val results = EtlRunner.runAll(spark, root, jobs)
    val line = results.toSeq.sortBy(_._1).map { case (t, r) =>
      s""""$t":${r.map(_.length).getOrElse(-1)}"""
    }.mkString("{", ",", "}")
    println(s"""{"etl_root":"$root","partitions_copied":$line}""")
    spark.stop()
  }
}
