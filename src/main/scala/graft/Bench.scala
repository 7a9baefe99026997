package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Plan fingerprint: executedPlan text with per-session ids stripped, so
    * the same logical plan hashes identically across rounds — BENCH_DETAILS
    * diffs then show which queries' PLANS changed, not just their times.
    */
  private def planFingerprint(df: org.apache.spark.sql.DataFrame): String = {
    val normalized = df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("@[0-9a-f]+", "@")
      // lambda variable names embed a JVM-global counter (lambda x_5 vs
      // x_17 for the SAME plan when unrelated queries shift the counter) —
      // without this, every HOF-bearing query false-churns whenever the
      // catalog grows
      .replaceAll("lambda ([A-Za-z]+)_\\d+", "lambda $1_")
      // MapPartitions prints the closure's synthetic class identity
      // ($$Lambda$3369/0x7f6a...), fresh per JVM — same false churn for
      // every typed/mapPartitions operator
      .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$\\$Lambda")
      // per-run temp fixture dirs would churn every fixture query's
      // fingerprint; the path identity isn't part of the plan shape
      .replaceAll("/tmp/[^\\s,\\]]+", "/tmp/_")
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(normalized.getBytes("UTF-8"))
    d.take(6).map("%02x".format(_)).mkString
  }

  /** Queries whose plan TEXT is data-dependent by design and therefore
    * can't fingerprint stably: q_quantile_store folds its sketch-estimated
    * quantiles (merge-order dependent) into a second query as literals —
    * the OUTPUT (accuracy booleans vs exact) is deterministic, the plan
    * string is not. Recorded as "volatile", skipped by the change gate.
    */
  private val fpVolatile = Set("q_quantile_store",
    // q_zone_map's executed plan embeds the zone-map fixture's pruned FILE
    // LIST; file names carry per-build UUIDs and listing order, so the
    // text churns across runs while the plan SHAPE (and the result, incl.
    // the pruning booleans) is deterministic.
    "q_zone_map",
    // multi-countDistinct plans rewrite through an Expand whose projection
    // lists are ordered by exprId — ids shift whenever the CATALOG grows,
    // so the normalized text moves positions even though the plan shape is
    // identical (observed: q_unicode_dedup churned between two runs of
    // unchanged query code). Mark every 2-countDistinct query volatile.
    "q_unicode_dedup", "q_datasheet")

  /** Previous round's per-query plan fingerprints, read from the committed
    * BENCH_DETAILS.json BEFORE this run overwrites it — the regression gate
    * input. Regex parse; the file is machine-written with a fixed shape.
    */
  private def previousFingerprints(): Map[String, String] = {
    val p = java.nio.file.Paths.get("BENCH_DETAILS.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val text = java.nio.file.Files.readString(p)
    """"([^"]+)":\{"min_s":[^}]*"plan_fp":"([0-9a-f]+|err)"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Max state-store footprint (rows, bytes) observed across the progress
    * events of whatever streaming queries ran since the last reset — the
    * per-drain state metric the r5 verdict asked for. Streaming listener
    * events ride the shared async bus; callers drain it (ListenerBusDrain)
    * before snapshotting.
    */
  private final class StateMeter
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val rows = new java.util.concurrent.atomic.AtomicLong(-1L)
    private val mem = new java.util.concurrent.atomic.AtomicLong(-1L)
    def reset(): Unit = { rows.set(-1L); mem.set(-1L) }
    def snapshot: (Long, Long) = (rows.get(), mem.get())
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val ops = e.progress.stateOperators
      if (ops != null && ops.nonEmpty) {
        val r = ops.map(_.numRowsTotal).sum
        val m = ops.map(_.memoryUsedBytes).sum
        rows.updateAndGet(x => math.max(x, r))
        mem.updateAndGet(x => math.max(x, m))
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev convenience: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run to
    // the named queries for drift isolation experiments; detail output then
    // goes to BENCH_DETAILS_subset.json so the committed per-round file
    // (and its plan-fingerprint baseline) is never clobbered by a subset
    // run. The driver always runs without it → full bench, normal file.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(n: String): Boolean = only.forall(_.contains(n))
    val detailPath =
      if (only.isEmpty) "BENCH_DETAILS.json" else "BENCH_DETAILS_subset.json"
    val prevFp = previousFingerprints()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Plan TEXT truncation is fingerprint poison: Spark elides metadata
      // strings (DataFilters, Location) past 100 chars BEFORE our exprId
      // normalization, so the cut position depends on the raw exprId
      // widths — i.e. on how many queries ran earlier in the session and
      // on catalog size. r4→r5 false churn (q13/q14) was exactly this.
      // Print everything; the normalizer handles ids and temp paths.
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.sql.debug.maxToStringFields", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb JIT +
    // session init cost (flagship on the smallest SF touches the same
    // read/agg machinery)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val stateMeter = new StateMeter
    spark.streams.addListener(stateMeter)
    // per-entry state metrics: detail-name -> (max state rows, max bytes)
    val stateMetrics = scala.collection.mutable.Map.empty[String, (Long, Long)]

    def timeQueries(names: Iterable[String], executedFp: Boolean,
        runs: Int = 3, backend: Option[String] = None)
        : Seq[(String, Seq[Double], String)] =
      names.toSeq.sorted.map { name =>
        val base = SparkEntry.queries(name)
        val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
          backend match {
            case Some(b) => (s, d) => QueryCatalog.withStateBackend(s, b)(base(s, d))
            case None    => base
          }
        val detailName = backend.map(b => s"$name@$b").getOrElse(name)
        stateMeter.reset()
        // Between queries: drop cached/checkpointed blocks left by fixture
        // builds and let a GC reclaim them, OUTSIDE the timed region. With
        // ~230 queries × multiple runs in one JVM the storage otherwise
        // accumulates until a full GC lands inside some innocent query's
        // timing (r3 dev run: a 0.3 s query measured at 52 s).
        spark.catalog.clearCache()
        // Evict state-store providers left loaded by earlier drains: a
        // terminated streaming query keeps its providers (RocksDB: native
        // memory off the Java heap) until a lazy maintenance tick, so
        // without this a drain's timing depends on which backends ran
        // before it — the r5 `q_stream_interp` +12% drift appeared exactly
        // when the RocksDB twins joined the section. Drains are cold-start
        // by construction (fresh checkpoints), so nothing reusable is lost.
        org.apache.spark.sql.graftx.StateStoreHygiene.unloadAll()
        System.gc()
        // three timed runs, report the min: the first can absorb codegen/
        // compile for plans not touched by the warmup, and a stray full GC
        // or compile storm can land in any ONE run — with three, the min is
        // the steady-state cost with high probability (r4 post-mortem: two
        // runs left a 1.23x uniform drift that masked real regressions)
        var lastDf: org.apache.spark.sql.DataFrame = null
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { lastDf = fn(spark, sfDir); lastDf.count() }
          catch { case _: Throwable => lastDf = null; -1L }
          (System.nanoTime() - t0) / 1e9
        }
        // batch queries fingerprint a FRESH un-executed plan (stable across
        // rounds, matches the r1–r3 corpus of fingerprints); streaming
        // drains reuse the last timed result instead — a fresh fn() call
        // would re-run the whole drain just to look at the plan
        val fp =
          if (fpVolatile(name)) "volatile"
          else try {
            if (executedFp) { if (lastDf == null) "err" else planFingerprint(lastDf) }
            else planFingerprint(fn(spark, sfDir))
          } catch { case _: Throwable => "err" }
        // state metrics: drain the async bus so the drain's last progress
        // events are counted, then record the max footprint observed
        org.apache.spark.graftx.ListenerBusDrain.drain(spark.sparkContext)
        val (srows, smem) = stateMeter.snapshot
        if (srows >= 0) stateMetrics(detailName) = (srows, smem)
        (detailName, times, fp)
      }

    val batch = timeQueries(
      (SparkEntry.queries -- QueryCatalog.benchExcluded).keys.filter(keep),
      executedFp = false)
    // The streaming drains + multi-step ETL mutations (benchExcluded from
    // the headline total so it stays comparable across rounds): each fn()
    // call builds a FRESH input fixture + checkpoint dir and drains it with
    // AvailableNow, so both runs are full cold drains — comparable
    // round-over-round. run1−run2 bounds the fixture-write share; the drain
    // (state store + sink I/O) dominates both.
    // drains/mutations build a fresh fixture + checkpoint per run (cold by
    // construction, no JIT-sensitivity) and are the expensive section — two
    // runs bound the noise without doubling the bench's wall clock
    val streaming = timeQueries(QueryCatalog.benchExcluded
      .filter(SparkEntry.queries.contains).filter(keep),
      executedFp = true, runs = 2)
    // The BACKEND AXIS pass (r5 verdict task 4): every streaming drain
    // again on RocksDB state (one run — cold by construction like the
    // default pass), recorded as `name@rocksdb` in its own section so the
    // headline streaming total stays comparable round-over-round. The two
    // `_rocksdb` twin queries are skipped here — they ARE that backend.
    val streamingRocks = timeQueries(
      QueryCatalog.streamingDrains.filterNot(_.endsWith("_rocksdb"))
        .filter(SparkEntry.queries.contains).filter(keep),
      executedFp = true, runs = 1, backend = Some("rocksdb"))

    def s3(v: Double) = f"$v%.3f"
    // full per-query detail (runs + plan fingerprint) goes to a FILE — the
    // driver only captures a bounded stdout tail, so the contract line below
    // stays compact (3-decimal times) to fit inside it
    def detailJson(rs: Seq[(String, Seq[Double], String)], section: String,
        backend: String) =
      rs.map { case (name, times, fp) =>
        val state = stateMetrics.get(name).map { case (r, m) =>
          s""","state_rows":$r,"state_mem_mb":${s3(m / 1e6)}"""
        }.getOrElse("")
        s""""$name":{"min_s":${s3(times.min)},"runs":[${times.map(s3).mkString(",")}],"plan_fp":"$fp","section":"$section","backend":"$backend"$state}"""
      }
    val detail = (detailJson(batch, "batch", "-") ++
      detailJson(streaming, "streaming", "hdfs") ++
      detailJson(streamingRocks, "streaming_rocksdb", "rocksdb"))
      .mkString("{", ",", "}")
    val total = batch.map(_._2.min).sum
    val streamingTotal = streaming.map(_._2.min).sum
    val rocksTotal = streamingRocks.map(_._2.min).sum
    // backend-equivalence gate on the state machine itself: the same drain
    // must hold the same LOGICAL state row count on either backend (only
    // the storage engine moves). Mismatches are listed for audit.
    val stateMismatch = streamingRocks.map(_._1).flatMap { rn =>
      val base = rn.stripSuffix("@rocksdb")
      (stateMetrics.get(base), stateMetrics.get(rn)) match {
        case (Some((a, _)), Some((b, _))) if a != b => Some(s"$base:$a!=$b")
        case _ => None
      }
    }.sorted
    if (stateMismatch.nonEmpty)
      System.err.println(s"[bench] STATE ROWS DIFFER across backends: ${stateMismatch.mkString(", ")}")
    // plan-fingerprint regression gate: every query whose fingerprint
    // changed vs the previous committed BENCH_DETAILS.json is listed —
    // unexplained churn here is a plan regression to audit, not a timing
    // blip. New queries (no previous fp) are not churn.
    val changed = (batch ++ streaming).collect {
      case (name, _, fp) if prevFp.get(name).exists(p => p != fp) => name
    }.sorted
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
      s"""{"sf":"$sfDir","cpus":$cpus,"total_s":${s3(total)},"streaming_total_s":${s3(streamingTotal)},"streaming_rocksdb_s":${s3(rocksTotal)},"state_rows_mismatch":${stateMismatch.map("\"" + _ + "\"").mkString("[", ",", "]")},"plan_changes":${changed.map("\"" + _ + "\"").mkString("[", ",", "]")},"queries":$detail}""")
    if (changed.nonEmpty)
      System.err.println(s"[bench] PLAN CHANGED vs previous round (${changed.size}): ${changed.mkString(", ")}")
    // the driver captures only a bounded stdout tail (~2.4 KB, shared with
    // sbt's trailing [success] line). The contract line must NEVER overflow
    // it — r2's did, and the driver recorded "parsed": null. Hard budget:
    // emit the total plus as many queries as fit, slowest first (the
    // informative ones); the complete per-query map lives in
    // BENCH_DETAILS.json, which is committed each round.
    val budget = 2000
    val entries = (batch ++ streaming).sortBy(-_._2.min)
      .map { case (name, times, _) => s""""$name":${s3(times.min)}""" }
    def wrap(qs: Seq[String]): String =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","streaming_s":${s3(streamingTotal)},"plan_changes":${changed.size},"queries":${qs.mkString("{", ",", "}")},"sf":"$sfDir","detail":"$detailPath"}"""
    var kept = entries
    while (wrap(kept).length > budget && kept.nonEmpty) kept = kept.dropRight(1)
    println(wrap(kept))
    spark.stop()
  }
}
