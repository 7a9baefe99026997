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
  *
  * DRIVER-SIDE IO since r11: the store used to round-trip every read and
  * write through a Spark job (`spark.read.parquet(...).collect()` /
  * `ds.coalesce(1).write.parquet(...)`), so a drain of N partitions paid
  * ~3N distributed-job latencies on a table of a few KB — the dominant
  * fixed cost of the sequential ETL loop at small scale and pure overhead
  * at any scale (optimization guide §1.2: remove work the job doesn't
  * need; §5: metadata belongs on the driver). Reads resolve the pointer
  * and serve from an in-memory cache keyed by the generation name (an
  * external writer lands a new generation, so the key check detects it);
  * a cache miss still loads via Spark (any parquet encoding, e.g. the
  * INT96 timestamps of Spark-written generations). Writes emit the
  * parquet file directly on the driver (parquet-hadoop example API, a
  * layout Spark reads back identically: one part file + `_SUCCESS`), so
  * the swap protocol — temp generation dir, `_SUCCESS`, pointer swap,
  * generation GC — is byte-compatible with the previous shape and the
  * crash-recovery contract ([[latestCompleteGen]]) is unchanged.
  */
final class StatusStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
  private val root = new org.apache.hadoop.fs.Path(path)
  private val pointer = new org.apache.hadoop.fs.Path(root, "_CURRENT")

  /** Last generation read or written by THIS instance: (gen dir name,
    * rows). Serving reads from it skips all IO while the pointer still
    * names that generation; any other writer necessarily creates a NEW
    * generation dir (names embed time + nonce), so staleness is detected
    * by the pointer resolve that every read still performs.
    */
  @volatile private var cache: (String, IndexedSeq[BackupStatus]) = null

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

  /** The current status set as a plain driver-side collection — the form
    * every consumer actually wants (the set is partition-list sized by
    * contract). Cache hit: no IO beyond the pointer read. Cache miss (first
    * read, or a generation written by another instance): one Spark read of
    * the tiny generation dir.
    */
  def rows(): IndexedSeq[BackupStatus] =
    currentDir.orElse(latestCompleteGen) match {
      case Some(dir) =>
        val c = cache
        if (c != null && c._1 == dir) c._2
        else {
          val loaded = spark.read.parquet(s"$path/$dir").as[BackupStatus]
            .collect().toIndexedSeq
          cache = (dir, loaded)
          loaded
        }
      case None => IndexedSeq.empty
    }

  /** Read the current status set EAGERLY (driver-resident, then re-lifted):
    * [[write]] garbage-collects generations beyond current+previous, so a
    * LAZY dataset held across two writes would fail at execution time on
    * deleted parquet files. The status set is tiny by contract (one row per
    * partition unit), so eager materialization is the same driver-side cost
    * the reference pays for its status query (`sqoop_table.py:41`).
    */
  def read(): Dataset[BackupStatus] = spark.createDataset(rows())

  /** Parquet schema of the status row, matching what Spark's own writer
    * produced for `Dataset[BackupStatus]` (nullability per the product
    * encoder; timestamps as INT64 micros, which Spark reads as
    * TIMESTAMP — the pinned-UTC session makes the value identical to the
    * previous INT96 encoding).
    */
  private def parquetSchema: org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation => L, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    Types.buildMessage()
      .optional(BINARY).as(L.stringType()).named("tableName")
      .optional(BINARY).as(L.stringType()).named("hiveDb")
      .optional(INT64).as(L.timestampType(true, TimeUnit.MICROS)).named("startDate")
      .optional(INT64).as(L.timestampType(true, TimeUnit.MICROS)).named("endDate")
      .optional(BINARY).as(L.stringType()).named("primaryPartitionColumn")
      .required(INT64).named("primaryPartitionValue")
      .required(BOOLEAN).named("isComplete")
      .required(INT32).named("numMappers")
      .named("spark_schema")
  }

  private def micros(t: Timestamp): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)

  /** Write `rows` as one parquet file + `_SUCCESS` under `gen` — the same
    * at-rest layout `ds.coalesce(1).write.parquet` produced, minus the
    * distributed job (the set is KBs; a Spark job here is pure scheduling
    * latency). Any parquet reader (including [[rows]]' cache-miss path and
    * external `spark.read.parquet`) sees the identical row set.
    */
  private def writeGen(gen: String, rows: Seq[BackupStatus]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    val dir = new org.apache.hadoop.fs.Path(root, gen)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val file = new org.apache.hadoop.fs.Path(dir, s"part-00000-$gen.snappy.parquet")
    val factory = new SimpleGroupFactory(parquetSchema)
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          file, spark.sparkContext.hadoopConfiguration))
      .withType(parquetSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { s =>
      val g = factory.newGroup()
      if (s.tableName != null) g.append("tableName", s.tableName)
      if (s.hiveDb != null) g.append("hiveDb", s.hiveDb)
      if (s.startDate != null) g.append("startDate", micros(s.startDate))
      s.endDate.foreach(t => g.append("endDate", micros(t)))
      if (s.primaryPartitionColumn != null)
        g.append("primaryPartitionColumn", s.primaryPartitionColumn)
      g.append("primaryPartitionValue", s.primaryPartitionValue)
      g.append("isComplete", s.isComplete)
      g.append("numMappers", s.numMappers)
      w.write(g)
    } finally w.close()
    val ok = fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true)
    ok.close()
  }

  /** Full-set overwrite with atomic pointer swap: readers see either the old
    * or the new complete set, never a partial write (replays are safe —
    * idempotent like the reference's existence-guarded DDL,
    * `sqoop_etl.py:61-75`). Superseded generations are garbage-collected,
    * keeping the current one plus the previous (for a reader that resolved
    * the pointer just before the swap).
    */
  def writeRows(rows: Seq[BackupStatus]): Unit = {
    val prev = currentDir
    val gen = s"gen-${System.currentTimeMillis()}-${scala.util.Random.nextInt(Int.MaxValue)}"
    writeGen(gen, rows)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.tmp.$gen")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer, false)
    fs.rename(tmp, pointer)
    cache = (gen, rows.toIndexedSeq)
    fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val stale = (n.startsWith("gen-") && n != gen && !prev.contains(n)) ||
        (n.startsWith("_CURRENT.tmp.") && n != s"_CURRENT.tmp.$gen")
      if (stale) fs.delete(p, true)
    }
  }

  def write(ds: Dataset[BackupStatus]): Unit =
    writeRows(ds.collect().toIndexedSeq)

  /** M2: `update sqoop_etl_status set is_complete='t', end_date=now() where
    * table=? and pid=?` (`sqoop_table.py:59-66`) as read-modify-write.
    */
  def markComplete(table: String, pid: Long, at: Timestamp): Unit =
    writeRows(rows().map { s =>
      if (s.tableName == table && s.primaryPartitionValue == pid)
        s.copy(isComplete = true, endDate = Some(at))
      else s
    })

  def append(newRows: Seq[BackupStatus]): Unit =
    writeRows(rows() ++ newRows)

  /** M3: `delete from … where key=?` (`sqoop_table.py:68-73`) as
    * filter-and-rewrite (anti-join semantics on the tiny status set).
    */
  def delete(table: String, pid: Long): Unit =
    writeRows(rows().filterNot(s =>
      s.tableName == table && s.primaryPartitionValue == pid))

  /** P5 predicate: pending units for a table (`sqoop_table.py:41`,`:107`). */
  def pending(table: String): Dataset[BackupStatus] =
    spark.createDataset(rows().filter(s => s.tableName == table && !s.isComplete))
}
