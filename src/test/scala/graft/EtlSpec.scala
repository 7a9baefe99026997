package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{BackupStatus, IncrementalBackup, JobConfig, StatusStore, TypeMapping}
import graft.operators.ReferenceOps

/** End-to-end incremental copy (the reference's whole job) + components. */
class EtlSpec extends SparkSpec {

  test("incremental backup copies every partition exactly once and is restart-idempotent") {
    val tmp = Files.createTempDirectory("graft-etl").toString
    val cfg = JobConfig(tableName = "orders", numMappers = 4)
    val store = new StatusStore(spark, s"$tmp/status")
    val job = new IncrementalBackup(spark, cfg, store, s"$tmp/dest")
    val orders = Tables.orders(spark, sf)

    val copied = job.run(orders)
    assert(copied.nonEmpty)
    // every source month copied
    import spark.implicits._
    val srcMonths = orders.select(ReferenceOps.monthSid(col("o_orderdate")))
      .distinct().as[Long].collect().toSet
    assert(copied.toSet == srcMonths)
    // read-back matches source row count
    assert(job.readBack().count() == orders.count())

    // rerun: nothing pending, no double-copy, counts unchanged
    val copiedAgain = job.run(orders)
    assert(copiedAgain.isEmpty)
    assert(job.readBack().count() == orders.count())
  }

  test("partial failure resume: pending partitions are drained without duplicating completed ones") {
    val tmp = Files.createTempDirectory("graft-etl2").toString
    val cfg = JobConfig(tableName = "orders", numMappers = 2)
    val store = new StatusStore(spark, s"$tmp/status")
    val job = new IncrementalBackup(spark, cfg, store, s"$tmp/dest")
    val orders = Tables.orders(spark, sf)

    val discovered = job.discover(orders)
    // simulate a crash after copying only the first partition
    job.copyPartition(orders, discovered.head)
    assert(store.pending("orders").count() == discovered.size - 1)
    // resume drains the rest (discover() finds nothing new — not-exists guard)
    val copied = job.run(orders)
    assert(copied.toSet == discovered.drop(1).toSet)
    assert(job.readBack().count() == orders.count())
  }

  test("full-snapshot mode (PRIMARY_ID='') copies once, then no-ops") {
    val tmp = Files.createTempDirectory("graft-etl3").toString
    val cfg = JobConfig(tableName = "nation", primaryId = "")
    val store = new StatusStore(spark, s"$tmp/status")
    val job = new IncrementalBackup(spark, cfg, store, s"$tmp/dest")
    val nation = Tables.nation(spark, sf)
    assert(job.run(nation) == Seq(0L))
    assert(job.readBack().count() == nation.count())
    assert(job.run(nation).isEmpty)
  }

  test("status store markComplete flips exactly the targeted row") {
    val tmp = Files.createTempDirectory("graft-status").toString
    val store = new StatusStore(spark, s"$tmp/status")
    val t = new java.sql.Timestamp(0L)
    store.append(Seq(
      BackupStatus("t1", "db", t, None, "m", 1L, isComplete = false, 4),
      BackupStatus("t1", "db", t, None, "m", 2L, isComplete = false, 4)))
    store.markComplete("t1", 1L, new java.sql.Timestamp(1000L))
    val rows = store.read().collect()
    assert(rows.count(_.isComplete) == 1)
    assert(rows.find(_.primaryPartitionValue == 1L).get.endDate.isDefined)
    assert(store.pending("t1").collect().map(_.primaryPartitionValue).toSeq == Seq(2L))
  }

  test("type mapping round-trips the reference's observed types") {
    import org.apache.spark.sql.types._
    assert(TypeMapping.verticaToSpark("numeric(18,4)") == DecimalType(18, 4))
    assert(TypeMapping.verticaToSpark("timestamp(6)") == TimestampType)
    assert(TypeMapping.verticaToSpark("int") == LongType)
    assert(TypeMapping.verticaToSpark("varchar(255)") == StringType)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DecimalType(10, 2))))
    assert(TypeMapping.ddlFragments(schema) == Seq("a int", "b numeric(10,2)"))
    assert(TypeMapping.createTableDdl("t", schema) ==
      "CREATE TABLE t (a int, b numeric(10,2))")
  }

  test("orc round-trip preserves decimal precision and µs timestamps exactly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-orc-rt").toString
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amt", DecimalType(18, 4)),
      StructField("tiny", DecimalType(38, 15)),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, BigDecimal("12345678901234.5678").bigDecimal,
        BigDecimal("0.000000000000001").bigDecimal,
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999")),
      Row(2L, BigDecimal("-0.0001").bigDecimal,
        BigDecimal("-12345678901234567890123.000000000000001").bigDecimal,
        java.sql.Timestamp.valueOf("1970-01-01 00:00:00.000001")),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    graft.sources.OrcSink.write(df, s"$tmp/t",
      graft.etl.JobConfig(tableName = "t"))
    val back = graft.sources.Sources.orc(spark, s"$tmp/t")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("bulk copy mode writes all pending partitions in one pass, same content") {
    val tmp = Files.createTempDirectory("graft-bulk").toString
    val cfg = JobConfig(tableName = "orders", numMappers = 2)
    val store = new StatusStore(spark, s"$tmp/status")
    val job = new IncrementalBackup(spark, cfg, store, s"$tmp/dest")
    val orders = Tables.orders(spark, sf)
    val copied = job.runBulk(orders)
    assert(copied.nonEmpty)
    assert(store.pending("orders").isEmpty)
    assert(job.readBack().count() == orders.count())
    // re-run: nothing new
    assert(job.runBulk(orders).isEmpty)
  }

  test("csv round-trip preserves values through the text transit format") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("delimiter", ",").csv(s"$tmp/n")
    val back = graft.sources.Sources.csv(spark, s"$tmp/n", nation.schema)
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("sequence-file round-trip preserves typed values (S10 alternate format)") {
    val tmp = Files.createTempDirectory("graft-seq").toString
    val orders = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice"),
        org.apache.spark.sql.functions.col("o_orderdate"),
        org.apache.spark.sql.functions.col("o_orderpriority"))
      .limit(500)
    graft.sources.Sources.sequenceFileWrite(orders, "o_orderkey", s"$tmp/s")
    val back = graft.sources.Sources.sequenceFile(spark, s"$tmp/s", orders.schema)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // the container really is a Hadoop SequenceFile (magic header "SEQ")
    val part = new java.io.File(s"$tmp/s").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(3)
    assert(new String(head, "US-ASCII") == "SEQ")
  }
}
