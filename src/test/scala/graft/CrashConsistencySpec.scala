package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.etl.{BackupStatus, StatusStore}
import graft.sources.Compaction

/** Failure injection at the swap boundaries of the atomic-swap stores
  * (r5 verdict task 6): every store that commits via temp-write-then-rename
  * must satisfy (a) a reader at ANY crash state sees the old complete set
  * or the new complete set — never a mix, and (b) re-running the operation
  * (or its recovery preamble) from any crash state converges to a correct
  * store. Crashes are injected by performing the protocol's steps manually
  * and stopping at each boundary.
  */
class CrashConsistencySpec extends SparkSpec {

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def statusRows(n: Int): Seq[BackupStatus] = {
    val t = new java.sql.Timestamp(0L)
    (1 to n).map(i =>
      BackupStatus("t1", "db", t, None, "m", i.toLong, isComplete = false, 4))
  }

  test("StatusStore: kill between pointer delete and rename rolls forward to the committed set") {
    val dir = Files.createTempDirectory("graft-crash-st").toString
    val store = new StatusStore(spark, dir)
    store.append(statusRows(3)) // old set, committed normally
    // --- simulate write(newSet) crashing between delete(_CURRENT) and
    // rename(tmp, _CURRENT): a complete newer gen + tmp pointer exist,
    // the pointer is gone
    import spark.implicits._
    val newSet = statusRows(3).map(_.copy(isComplete = true))
    val gen = s"gen-${System.currentTimeMillis() + 1000}-42"
    spark.createDataset(newSet).coalesce(1).write.parquet(s"$dir/$gen")
    val tmp = new Path(dir, s"_CURRENT.tmp.$gen")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(dir, "_CURRENT"), false)
    // reader in the crash window: the newest COMPLETE gen — the set being
    // committed — not an empty store
    assert(store.read().collect().forall(_.isComplete),
      "crash-window read must see the committed new set")
    // and the store keeps working: a subsequent write commits + GCs
    store.markComplete("t1", 1L, new java.sql.Timestamp(1L))
    assert(store.read().count() == 3)
    val gens = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .count(_.startsWith("gen-"))
    assert(gens <= 2, s"generation GC left $gens dirs")
  }

  test("StatusStore: an UNCOMMITTED generation (no _SUCCESS) is never read") {
    val dir = Files.createTempDirectory("graft-crash-st2").toString
    val store = new StatusStore(spark, dir)
    store.append(statusRows(2))
    // a write that died mid-parquet-job: gen dir present, no _SUCCESS
    val orphan = new Path(dir, s"gen-${System.currentTimeMillis() + 5000}-7")
    fs.mkdirs(orphan)
    val junk = fs.create(new Path(orphan, "part-00000.parquet"), true)
    try junk.write(Array[Byte](1, 2, 3)) finally junk.close()
    // pointer intact → pointer wins
    assert(store.read().count() == 2)
    // pointer lost → fallback must SKIP the incomplete gen
    fs.delete(new Path(dir, "_CURRENT"), false)
    assert(store.read().count() == 2)
  }

  test("Compaction: reader sees old or new at every crash state; recovery converges from each") {
    val dir = Files.createTempDirectory("graft-crash-cp").toString
    val t = s"$dir/t"
    Tables.nation(spark, sf).repartition(4).write.parquet(t)
    val expect = spark.read.parquet(t).collect().map(_.toString).sorted.toSeq
    def rows() = spark.read.parquet(t).collect().map(_.toString).sorted.toSeq

    val p = new Path(t)
    val tmp = new Path(p.getParent, s".${p.getName}.compact.tmp")
    val old = new Path(p.getParent, s".${p.getName}.compact.old")

    // state A: rewrite complete in tmp, live dir untouched → reader: old set
    spark.read.parquet(t).repartition(1).write.parquet(tmp.toString)
    assert(rows() == expect)
    // state B: live dir renamed away (the kill window between the two
    // renames) → live name missing; recovery rolls FORWARD (tmp complete)
    fs.rename(p, old)
    assert(!fs.exists(p))
    Compaction.recover(spark, t)
    assert(rows() == expect, "roll-forward must expose the complete rewrite")
    assert(!fs.exists(old) && !fs.exists(tmp), "markers cleaned after recovery")

    // crash with an INCOMPLETE rewrite (no _SUCCESS in tmp) → roll BACK
    fs.mkdirs(tmp)
    val junk = fs.create(new Path(tmp, "part-junk.parquet"), true)
    try junk.write(Array[Byte](9)) finally junk.close()
    fs.rename(p, old)
    Compaction.recover(spark, t)
    assert(rows() == expect, "roll-back must restore the displaced original")

    // and a plain re-run from the healthy state still compacts
    val st = Compaction.compact(spark, t, targetBytes = 1L << 30)
    assert(st.filesAfter == 1 && rows() == expect)
  }

  test("compactPartitions: a crashed child swap is recovered, hidden markers are not mistaken for partitions") {
    val dir = Files.createTempDirectory("graft-crash-cpp").toString
    val root = s"$dir/store"
    Tables.nation(spark, sf)
      .withColumn("band", pmod(col("n_nationkey"), lit(3)))
      .repartition(4)
      .write.partitionBy("band").parquet(root)
    val expect = spark.read.parquet(root).count()
    // crash band=1 inside the swap window: rewrite complete, live dir gone
    val child = new Path(s"$root/band=1")
    val ctmp = new Path(child.getParent, ".band=1.compact.tmp")
    spark.read.parquet(child.toString).repartition(1).write.parquet(ctmp.toString)
    fs.rename(child, new Path(child.getParent, ".band=1.compact.old"))
    // the maintenance pass must first finish that swap, then compact all
    val st = Compaction.compactPartitions(spark, root, targetBytes = 1L << 30)
    assert(st.filesAfter == 3, s"expected one file per partition, got $st")
    assert(spark.read.parquet(root).count() == expect)
    assert(!fs.listStatus(new Path(root)).exists(_.getPath.getName.startsWith(".")),
      "no hidden marker dirs may survive the maintenance pass")
  }

  test("IvfStore: a died append (uncommitted temp files) is invisible; the retry lands exactly once") {
    val dir = Files.createTempDirectory("graft-crash-ivf").toString
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 200)
    val wave = emb.filter(col("vec_id") >= 200 && col("vec_id") < 240)
    val cents = graft.similarity.KMeansIvf.fit(base, k = 4, iters = 2)
    graft.similarity.IvfStore.build(base, s"$dir/ivf", cents)
    val before = spark.read.parquet(s"$dir/ivf/vectors").count()
    // a killed append job leaves committer staging behind: an uncommitted
    // attempt AND a committed-task dir (the dangerous one — a later job's
    // commit would MERGE it into the store as duplicate rows if append
    // didn't clean staging first). Neither may surface to readers.
    val attempt = new Path(
      s"$dir/ivf/vectors/_temporary/0/_temporary/attempt_0/cluster=0")
    fs.mkdirs(attempt)
    val j0 = fs.create(new Path(attempt, "part-00000.parquet"), true)
    try j0.write(Array[Byte](1)) finally j0.close()
    val tdir = new Path(s"$dir/ivf/vectors/_temporary/0/task_dead_0/cluster=0")
    fs.mkdirs(tdir)
    val j1 = fs.create(new Path(tdir, "part-00000.parquet"), true)
    try j1.write(Array[Byte](1)) finally j1.close()
    val j2 = fs.create(new Path(s"$dir/ivf/vectors/cluster=0/.part-dead.parquet.tmp"), true)
    try j2.write(Array[Byte](2)) finally j2.close()
    assert(spark.read.parquet(s"$dir/ivf/vectors").count() == before,
      "uncommitted append debris must be invisible")
    // the retry (the job's unit of replay) appends the wave exactly once
    graft.similarity.IvfStore.append(wave, s"$dir/ivf")
    assert(spark.read.parquet(s"$dir/ivf/vectors").count() ==
      before + wave.count())
  }

  test("swapIn (manifest commit path): first write, kill window, incomplete rewrite, and a crashed refresh all converge") {
    import graft.sources.Compaction
    val dir = Files.createTempDirectory("graft-crash-swap").toString
    val m = s"$dir/manifest"
    import spark.implicits._
    def write(n: Int): Unit = Compaction.swapIn(spark, m) { tmp =>
      spark.range(n).coalesce(1).write.parquet(tmp)
    }
    // first write: no live dir to displace
    write(3)
    assert(spark.read.parquet(m).count() == 3)
    // normal replace
    write(5)
    assert(spark.read.parquet(m).count() == 5)
    val p = new Path(m)
    val tmp = new Path(p.getParent, s".${p.getName}.compact.tmp")
    val old = new Path(p.getParent, s".${p.getName}.compact.old")
    // kill window between the two renames: complete rewrite staged, live
    // dir renamed away → recover() must roll FORWARD to the new set
    spark.range(7).coalesce(1).write.parquet(tmp.toString)
    fs.rename(p, old)
    Compaction.recover(spark, m)
    assert(spark.read.parquet(m).count() == 7, "roll-forward to the staged set")
    // incomplete rewrite (no _SUCCESS) + displaced live → roll BACK
    fs.mkdirs(tmp)
    val junk = fs.create(new Path(tmp, "part-junk.parquet"), true)
    try junk.write(Array[Byte](1)) finally junk.close()
    fs.rename(p, old)
    Compaction.recover(spark, m)
    assert(spark.read.parquet(m).count() == 7, "roll-back to the displaced set")
    // a refresh that died MID-CHECKPOINT-WRITE (incomplete tmp inside the
    // manifest log, no _SUCCESS, no live checkpoint yet) must not be
    // mistaken for a checkpoint: refreshManifest clears the debris and
    // commits a fresh, correct build. (A crashed checkpoint whose tmp
    // completed is the roll-forward case above — swapIn's protocol is the
    // same at the new location.)
    val lakeDf = Tables.orders(spark, sf).limit(500)
    lakeDf.repartition(2).write.parquet(s"$dir/lake")
    val cfg = graft.etl.JobConfig(tableName = "orders", numMappers = 2)
    val job = new graft.etl.IncrementalBackup(spark, cfg,
      new graft.etl.StatusStore(spark, s"$dir/status"), dir)
    val mroot = new Path(job.manifestPath)
    val mtmp = new Path(mroot, ".checkpoint.compact.tmp")
    fs.mkdirs(mtmp)
    val mj = fs.create(new Path(mtmp, "part-dead.parquet"), true)
    try mj.write(Array[Byte](2)) finally mj.close()
    val stats = job.refreshManifest(s"$dir/lake")
    assert(stats.count() == spark.read.parquet(s"$dir/lake").inputFiles.length)
    assert(!fs.exists(mtmp))
  }

  test("ManifestLog: delta-commit kill windows — staged-but-unpublished is invisible and re-derived; published twice folds to an empty diff; stale folded deltas are ignored") {
    val dir = Files.createTempDirectory("graft-crash-mlog").toString
    val orders = Tables.orders(spark, sf)
    val lake = s"$dir/lake"
    Files.createDirectories(java.nio.file.Paths.get(lake))
    def land(df: org.apache.spark.sql.DataFrame, prefix: String): Unit = {
      val stage = s"$dir/stage-$prefix"
      df.repartitionByRange(2, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate").write.parquet(stage)
      val st = Files.list(java.nio.file.Paths.get(stage))
      try st.forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.copy(p, java.nio.file.Paths.get(lake, prefix + p.getFileName))
      } finally st.close()
    }
    land(orders.filter(col("o_orderdate") < lit("1996-01-01")), "w1-")
    val cfg = graft.etl.JobConfig(tableName = "orders", numMappers = 2)
    val job = new graft.etl.IncrementalBackup(spark, cfg,
      new graft.etl.StatusStore(spark, s"$dir/status"), dir)
    val m1 = job.refreshManifest(lake)
    val w1Count = m1.count()
    assert(w1Count == spark.read.parquet(lake).inputFiles.length)

    // wave 2 lands; CRASH (a): the delta is staged but never published —
    // readers in the window still see the OLD complete manifest
    land(orders.filter(col("o_orderdate") >= lit("1996-01-01")), "w2-")
    val log = new graft.sources.ManifestLog(spark, job.manifestPath)
    val prior = log.current().get
    val pid = Seq("pid" -> job.pidCol(spark.read.parquet(lake)))
    val diff = graft.sources.StatsStore
      .collectExprDiff(spark, lake, pid, prior, None)
    diff.adds.withColumn("tombstone", lit(false)).coalesce(1)
      .write.parquet(s"${job.manifestPath}/.delta-1.tmp")
    assert(log.current().get.count() == w1Count,
      "a staged, unpublished delta must be invisible")
    // retry converges: debris cleared, delta re-derived and committed
    val m2 = job.refreshManifest(lake)
    assert(m2.count() == spark.read.parquet(lake).inputFiles.length)
    assert(!fs.listStatus(new Path(job.manifestPath))
      .exists(_.getPath.getName.endsWith(".tmp")), "staging debris left")

    // CRASH (b): the delta published but the drain died right after —
    // a re-run derives an EMPTY diff and appends NOTHING (idempotent)
    def deltaDirs() = fs.listStatus(new Path(job.manifestPath))
      .count(_.getPath.getName.startsWith("delta-"))
    val before = deltaDirs()
    val m3 = job.refreshManifest(lake)
    assert(m3.count() == m2.count())
    assert(deltaDirs() == before, "an idle refresh must append no delta")

    // CRASH (c): checkpoint swapped but folded-delta GC died — a stale
    // delta with seq <= upto must be IGNORED by readers, then GC'd
    val cfg2 = cfg.copy(manifestCheckpointEvery = 1) // fold every drain
    val job2 = new graft.etl.IncrementalBackup(spark, cfg2,
      new graft.etl.StatusStore(spark, s"$dir/status"), dir)
    job2.refreshManifest(lake) // folds everything into the checkpoint
    val expect = job2.readManifest().collect().map(_.toString).sorted.toSeq
    // fabricate a stale folded delta: garbage rows at a low seq
    val staleTmp = s"${job.manifestPath}/.delta-0.tmp"
    diff.adds.withColumn("tombstone", lit(true)).coalesce(1)
      .write.parquet(staleTmp)
    fs.rename(new Path(staleTmp), new Path(s"${job.manifestPath}/delta-0"))
    assert(job2.readManifest().collect().map(_.toString).sorted.toSeq == expect,
      "a delta below the checkpoint's upto must be ignored")
    job2.refreshManifest(lake) // gc() clears it
    assert(!fs.exists(new Path(s"${job.manifestPath}/delta-0")))
  }

  test("a crashed IngestLog.record converges on the ingest's retry at every protocol point: staged, claim-created, published (r11: exclusive-claim protocol)") {
    import graft.sources.{FaultPoints, IngestLog}
    val root = Files.createTempDirectory("graft-crash-ing").toString
    val files = Seq("/w/a.parquet", "/w/b.parquet")
    for (point <- Seq("ingest.wave.staged", "ingest.claim.created",
        "ingest.wave.published")) {
      val lake = s"$root/lake-${point.replace('.', '-')}"
      Files.createDirectories(java.nio.file.Paths.get(lake))
      FaultPoints.install { n =>
        if (n == point) throw new RuntimeException(s"injected@$n")
      }
      val crashed =
        try { IngestLog.record(spark, lake, files); false }
        catch { case e: RuntimeException
          if e.getMessage.startsWith("injected@") => true }
        finally FaultPoints.clear()
      assert(crashed, s"$point: fault did not fire")
      // the ingest's retry: the files are fully landed, so the recorder
      // simply records again (the r9 contract — a loser/crasher never
      // aborts a landed ingest)
      val seq = IngestLog.record(spark, lake, files)
      val (got, head) = IngestLog.filesSince(spark, lake, -1L)
      assert(head == seq, s"$point: head $head != $seq")
      if (point == "ingest.wave.published") {
        // crash AFTER publish: wave 1 landed, the retry re-records the
        // same files as wave 2 — a duplicate the manifest diff folds to
        // an empty delta (idempotent by design)
        assert(IngestLog.waves(spark, lake) == Seq(seq - 1, seq))
        assert(got == files ++ files, s"$point: $got")
      } else {
        // crash BEFORE publish: nothing visible landed; the retry's wave
        // is the only one (an aborted claim leaves a harmless seq gap —
        // claim-created shows seq 2 with no wave-1)
        assert(IngestLog.waves(spark, lake) == Seq(seq))
        assert(got == files, s"$point: $got")
      }
    }
  }

  test("crash-fuzz: a journaled drain aborted at 20+ seeded random fault points converges on re-run to the never-crashed twin (r9 verdict task 6)") {
    import graft.sources.{FaultPoints, IngestLog}
    val root = Files.createTempDirectory("graft-fuzz").toString
    // small synthetic month-keyed waves (month_sid carried as a column →
    // cheap copies; ~8 copy jobs per drain keeps 20+ trials tractable)
    def waveDf(months: Seq[Long]) = months.map(m =>
        spark.range(40).select(lit(m).as("month_sid"), col("id").as("payload")))
      .reduce(_ unionByName _)
    def stage(name: String, months: Seq[Long]): String = {
      val d = s"$root/stage-$name"
      waveDf(months).repartitionByRange(2, col("month_sid"))
        .sortWithinPartitions("month_sid").write.parquet(d)
      d
    }
    val w1 = stage("w1", Seq(199501L, 199502L, 199503L))
    val w2 = stage("w2", Seq(199504L, 199505L, 199506L, 199507L, 199508L))
    def land(stageDir: String, lake: String, prefix: String): Seq[String] = {
      Files.createDirectories(java.nio.file.Paths.get(lake))
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      val st = Files.list(java.nio.file.Paths.get(stageDir))
      try st.forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) {
          val dst = java.nio.file.Paths.get(lake, prefix + p.getFileName)
          Files.copy(p, dst); landed += dst.toString
        }
      } finally st.close()
      landed.toSeq
    }
    val cfg = graft.etl.JobConfig(tableName = "t", numMappers = 1,
      outputFileFormat = "parquet", manifestCheckpointEvery = 2)
    def mkJob(tag: String) = new graft.etl.IncrementalBackup(spark, cfg,
      new graft.etl.StatusStore(spark, s"$root/$tag/status"), s"$root/$tag/dest")
    def runSetup(tag: String): graft.etl.IncrementalBackup = {
      val lake = s"$root/$tag/lake"
      val job = mkJob(tag)
      IngestLog.record(spark, lake, land(w1, lake, "w1-"))
      job.runPrunedIncremental(lake)
      IngestLog.record(spark, lake, land(w2, lake, "w2-"))
      job
    }
    // the never-crashed TWIN: the convergence target
    val twin = runSetup("twin")
    twin.runPrunedIncremental(s"$root/twin/lake")
    import spark.implicits._
    def backMap(j: graft.etl.IncrementalBackup) = j.readBack()
      .groupBy(col("pid").cast("long").as("m")).count()
      .as[(Long, Long)].collect().toMap
    def manifestNames(j: graft.etl.IncrementalBackup) =
      j.readManifest().select("file").as[String].collect()
        .map(f => new Path(f).getName).toSet
    val wantBack = backMap(twin)
    val wantManifest = manifestNames(twin)
    assert(wantBack.keySet == Set(199501L, 199502L, 199503L, 199504L,
      199505L, 199506L, 199507L, 199508L))

    // dry run to ENUMERATE the drain's fault-point occurrences — the fuzz
    // domain is discovered, not hand-listed, so a newly added hit point
    // automatically joins the domain
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val dry = runSetup("dry") // setup OUTSIDE the count: trials fuzz drain 2 only
    FaultPoints.install(name => { seen += name; () })
    try dry.runPrunedIncremental(s"$root/dry/lake")
    finally FaultPoints.clear()
    val domain = seen.toIndexedSeq
    assert(domain.size >= 10, s"too few fault occurrences to fuzz: $domain")
    assert(backMap(mkJob("dry")) == wantBack) // counting handler is inert

    // seeded, reproducible trials: >= 20 distinct occurrences (all of them
    // when the domain is small), each aborting drain 2 mid-protocol
    val rng = new scala.util.Random(42)
    val picks =
      if (domain.size <= 24) domain.indices.toIndexedSeq
      else rng.shuffle(domain.indices.toIndexedSeq).take(24).sorted
    assert(picks.size >= 10)
    var aborted = 0
    picks.foreach { target =>
      val tag = s"trial-$target"
      val job = runSetup(tag)
      val lake = s"$root/$tag/lake"
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      FaultPoints.install { name =>
        if (n.getAndIncrement() == target)
          throw new RuntimeException(s"injected@$name#$target")
      }
      val crashed =
        try { job.runPrunedIncremental(lake); false }
        catch { case e: RuntimeException if e.getMessage.startsWith("injected@") => true }
        finally FaultPoints.clear()
      if (crashed) aborted += 1
      // convergence: the plain re-run completes whatever the abort left
      val again = job.runPrunedIncremental(lake)
      assert(job.runPrunedIncremental(lake).isEmpty,
        s"$tag: drain not quiescent after recovery (copied $again then more)")
      assert(backMap(job) == wantBack, s"$tag: read-back diverged")
      assert(manifestNames(job) == wantManifest, s"$tag: manifest diverged")
      assert(new graft.etl.StatusStore(spark, s"$root/$tag/status")
        .pending("t").isEmpty, s"$tag: pending units left")
    }
    // the fuzz must have actually aborted drains (occurrences within the
    // drain being fuzzed), not just picked indices past the hit count
    assert(aborted >= 10, s"only $aborted/${picks.size} trials aborted")
  }

  test("IvfStore: a crashed cluster-leaf swap is recovered by compact; rows and probe results preserved") {
    val dir = Files.createTempDirectory("graft-crash-ivfc").toString
    val emb = Tables.embeddings(spark, sf)
    val cents = graft.similarity.KMeansIvf.fit(
      emb.filter(col("vec_id") < 200), k = 4, iters = 2)
    graft.similarity.IvfStore.build(emb.filter(col("vec_id") < 200), s"$dir/ivf", cents)
    graft.similarity.IvfStore.append(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 240), s"$dir/ivf")
    val rowsBefore = spark.read.parquet(s"$dir/ivf/vectors").count()
    def probe() = graft.similarity.IvfStore
      .probe(emb.filter(col("vec_id") < 5), s"$dir/ivf", k = 5, nprobe = 3)
      .collect().map(_.toString).sorted.toSeq
    val expect = probe()

    // crash one cluster= leaf inside the swap window: rewrite complete in
    // tmp, live dir renamed away — the kill window between the two renames
    val leaf = fs.listStatus(new Path(s"$dir/ivf/vectors"))
      .filter(_.getPath.getName.startsWith("cluster=")).head.getPath
    val ltmp = new Path(leaf.getParent, s".${leaf.getName}.compact.tmp")
    spark.read.parquet(leaf.toString).repartition(1).write.parquet(ltmp.toString)
    fs.rename(leaf, new Path(leaf.getParent, s".${leaf.getName}.compact.old"))
    assert(!fs.exists(leaf))

    // the maintenance pass must finish that swap first, then compact every
    // inverted list — and change neither the row set nor probe results
    val st = graft.similarity.IvfStore.compact(spark, s"$dir/ivf", maxParallel = 4)
    assert(st.filesAfter < st.filesBefore, s"no compaction happened: $st")
    assert(spark.read.parquet(s"$dir/ivf/vectors").count() == rowsBefore,
      "compaction must preserve the exact store row count")
    assert(probe() == expect, "probe results must be unchanged by compaction")
    assert(!fs.listStatus(new Path(s"$dir/ivf/vectors"))
      .exists(_.getPath.getName.contains(".compact.")),
      "no hidden marker dirs may survive the maintenance pass")
  }

  test("VisualIndex: a crashed NESTED child swap (q=/qb=) is recovered; compaction preserves rows and gate results") {
    import graft.multimodal.VisualIndex
    val dir = Files.createTempDirectory("graft-crash-vis").toString
    val vis = s"$dir/vis"
    // signatures straight from a formula — the store/probe contract is on
    // (doc_id, sig) rows, pixels never reach it
    def sigs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("doc_id"),
        (col("id") * lit(2654435761L)).as("sig"))
    VisualIndex.build(sigs(0, 150), vis)
    VisualIndex.append(sigs(150, 200), vis) // second small-file layer
    val rowsBefore = spark.read.parquet(vis).count()
    def probe() = VisualIndex.probe(sigs(200, 240), spark, vis, maxHamming = 3)
      .collect().map(_.toString).sorted.toSeq
    val expect = probe()

    // crash one LEAF swap two levels down: rewrite complete in tmp, live
    // dir renamed away — the kill window between the two renames
    val qDir = fs.listStatus(new Path(vis))
      .filter(_.getPath.getName.startsWith("q=")).head.getPath
    val leaf = fs.listStatus(qDir)
      .filter(_.getPath.getName.startsWith("qb=")).head.getPath
    val ltmp = new Path(leaf.getParent, s".${leaf.getName}.compact.tmp")
    spark.read.parquet(leaf.toString).repartition(1).write.parquet(ltmp.toString)
    fs.rename(leaf, new Path(leaf.getParent, s".${leaf.getName}.compact.old"))
    assert(!fs.exists(leaf))

    // the nested maintenance pass must finish that swap first, then
    // compact every leaf — and change neither the row set nor the gate
    val st = Compaction.compactPartitions(spark, vis, targetBytes = 1L << 30)
    assert(st.filesAfter < st.filesBefore, s"no compaction happened: $st")
    assert(spark.read.parquet(vis).count() == rowsBefore,
      "compaction must preserve the exact index row count")
    assert(probe() == expect, "gate results must be unchanged by compaction")
    def noMarkers(p: Path): Unit = fs.listStatus(p).foreach { s =>
      assert(!s.getPath.getName.contains(".compact."),
        s"marker survived: ${s.getPath}")
      if (s.isDirectory) noMarkers(s.getPath)
    }
    noMarkers(new Path(vis))
  }
}
