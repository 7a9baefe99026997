package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-structured manifest store — the lakehouse transaction-log idiom the
  * reference's status table embodies (`/root/reference/sqoop_table.py:143-145`
  * is an append-only journal): instead of rewriting the FULL manifest every
  * drain (an O(total-files) write — a ~100-400 MB single task at 100 TB /
  * 1-4 M files, the r8 verdict's last history-proportional step), each
  * refresh appends a small DELTA (stats rows for files that appeared,
  * tombstone rows for files that vanished) and every k-th refresh folds
  * checkpoint+deltas into a new checkpoint. Steady-state manifest WRITE
  * cost is therefore ∝ new files; the O(N) fold is paid 1/k of the time
  * and runs as a distributed job.
  *
  * Layout under `path`:
  *   checkpoint/   full snapshot ([[Compaction.swapIn]]-managed; holds a
  *                 `_upto-N` marker naming the highest delta seq folded in)
  *   delta-N/      one small parquet dir: manifest rows + `tombstone` col
  *   _wave-N       ingest-journal watermark (see [[IngestLog]])
  *
  * Crash discipline: a delta is staged at `.delta-N.tmp` and published by
  * ONE atomic rename; the checkpoint uses the two-rename + [[Compaction.recover]]
  * protocol; deltas already folded (seq <= upto) are ignored by readers, so
  * the GC after a checkpoint can die midway without consequence. A reader
  * at ANY crash instant sees a complete manifest (old or new), never a mix.
  * Single writer per table by contract (the ETL drain holds the table's
  * [[graft.operators.JobLock]]).
  */
final class ManifestLog(spark: SparkSession, path: String) {

  private val root = new Path(path)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def ckptPath = new Path(root, "checkpoint")
  private def deltaPath(seq: Long) = new Path(root, s"delta-$seq")

  private def deltaSeqs: Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName).collect {
      case n if n.startsWith("delta-") &&
        fs.exists(new Path(root, s"$n/_SUCCESS")) =>
        n.stripPrefix("delta-").toLong
    }.toIndexedSeq

  /** Highest delta seq folded into the checkpoint; -1 when none exists. */
  private def ckptUpto: Long =
    if (!fs.exists(new Path(ckptPath, "_SUCCESS"))) -1L
    else fs.listStatus(ckptPath).map(_.getPath.getName)
      .collectFirst { case n if n.startsWith("_upto-") =>
        n.stripPrefix("_upto-").toLong }
      .getOrElse(throw new IllegalStateException(
        s"checkpoint at $ckptPath has no _upto marker"))

  def deltasSinceCheckpoint: Int = {
    val upto = ckptUpto
    deltaSeqs.count(_ > upto)
  }

  /** Clean up folded deltas (a checkpoint that crashed between its swap and
    * the delta GC leaves them — harmless to readers, removed here) and any
    * staging dir a crashed [[commitDelta]] left. Single-writer contract
    * makes deleting stale `.delta-*.tmp` safe.
    */
  def gc(): Unit = {
    if (!fs.exists(root)) return
    val upto = ckptUpto
    deltaSeqs.filter(_ <= upto).foreach(s => fs.delete(deltaPath(s), true))
    fs.listStatus(root).map(_.getPath).foreach { p =>
      if (p.getName.startsWith(".delta-") && p.getName.endsWith(".tmp"))
        fs.delete(p, true)
    }
  }

  /** The folded manifest: checkpoint ∪ live deltas, last-writer-wins per
    * file, tombstoned files dropped. None when the log is empty. The fold
    * key is the scheme-normalized path, because `input_file_name()` yields
    * `file:///x` while listings print `file:/x` and a tombstone must
    * shadow the add it kills regardless of which form each carries.
    */
  def current(): Option[DataFrame] = {
    Compaction.recover(spark, ckptPath.toString)
    val upto = ckptUpto
    val live = deltaSeqs.filter(_ > upto).sorted
    if (upto < 0 && live.isEmpty) None
    else {
      val ck =
        if (upto < 0) Seq.empty
        else Seq(spark.read.parquet(ckptPath.toString)
          .withColumn("tombstone", lit(false))
          .withColumn("__seq", lit(upto)))
      val ds = live.map(s => spark.read.parquet(deltaPath(s).toString)
        .withColumn("__seq", lit(s)))
      val all = (ck ++ ds).reduce(_ unionByName _)
      val w = Window.partitionBy(col("__key")).orderBy(col("__seq").desc)
      Some(all
        .withColumn("__key",
          regexp_replace(col("file"), "^[a-z][a-z0-9+.\\-]*:/+", "/"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && !col("tombstone"))
        .drop("__key", "__seq", "__rn", "tombstone"))
    }
  }

  private def nextSeq: Long =
    math.max(ckptUpto, deltaSeqs.maxOption.getOrElse(-1L)) + 1

  /** Append one delta: `adds` are full manifest rows for files that
    * appeared; `dead` are stored paths of files that vanished (tombstones).
    * Staged at `.delta-N.tmp`, published by a single atomic rename — a
    * crash before the rename leaves only invisible debris ([[gc]] clears
    * it), a crash after it leaves a committed delta whose re-derivation on
    * retry is an empty diff. Write size ∝ the diff, never the manifest.
    * Returns the published seq, or None for an empty diff (no delta dir is
    * created — idle drains append nothing).
    */
  def commitDelta(adds: DataFrame, dead: Seq[String]): Option[Long] = {
    val hasAdds = adds.head(1).nonEmpty
    if (!hasAdds && dead.isEmpty) return None
    val withT = adds.withColumn("tombstone", lit(false))
    val schema = withT.schema
    val tombs = dead.map { f =>
      Row.fromSeq(f +: schema.fields.toSeq.tail.map { fd =>
        if (fd.name == "tombstone") java.lang.Boolean.TRUE
        else if (fd.name == "n_rows") 0L
        else null
      })
    }
    import scala.jdk.CollectionConverters._
    val delta = withT.unionByName(spark.createDataFrame(tombs.asJava, schema))
    val seq = nextSeq
    val tmp = new Path(root, s".delta-$seq.tmp")
    fs.delete(tmp, true)
    delta.coalesce(1).write.parquet(tmp.toString)
    Compaction.renameOrThrow(fs, tmp, deltaPath(seq))
    Some(seq)
  }

  /** Fold checkpoint + live deltas into a NEW checkpoint (atomic two-rename
    * swap), then GC the folded deltas. No-op when no delta is live. The
    * fold is the only O(total-files) write left in manifest maintenance,
    * paid once per `manifestCheckpointEvery` drains; `numFiles` shards
    * the snapshot so a multi-million-row manifest (100 TB / millions of
    * lake files) is not a single 100-400 MB write task — callers size it
    * from the manifest's known row count.
    */
  def checkpoint(numFiles: Int = 1): Unit = {
    val upto = ckptUpto
    val live = deltaSeqs.filter(_ > upto)
    if (live.isEmpty) return
    val target = live.max
    val folded = current().get
    Compaction.swapIn(spark, ckptPath.toString) { tmp =>
      folded.coalesce(math.max(1, numFiles)).write.parquet(tmp)
      // marker AFTER the snapshot is complete, still before any rename —
      // a checkpoint is only ever visible with its coverage recorded
      fs.create(new Path(tmp, s"_upto-$target"), true).close()
    }
    gc()
  }

  // ---- ingest-journal watermark ------------------------------------------

  /** Highest [[IngestLog]] wave already folded into this manifest; -1 when
    * journal consumption hasn't started. Stored as an empty `_wave-N`
    * marker file; on update the new marker is created before old ones are
    * deleted, so a crash leaves several markers and the max wins —
    * re-consuming an already-folded wave is an empty diff (idempotent).
    */
  def waveWatermark: Long =
    if (!fs.exists(root)) -1L
    else fs.listStatus(root).map(_.getPath.getName)
      .collect { case n if n.startsWith("_wave-") =>
        n.stripPrefix("_wave-").toLong }
      .maxOption.getOrElse(-1L)

  def setWaveWatermark(n: Long): Unit = {
    if (n < 0 || n <= waveWatermark) return
    fs.mkdirs(root)
    fs.create(new Path(root, s"_wave-$n"), true).close()
    fs.listStatus(root).map(_.getPath).foreach { p =>
      if (p.getName.startsWith("_wave-") &&
        p.getName.stripPrefix("_wave-").toLong < n)
        fs.delete(p, false)
    }
  }

  /** Refreshes since the last checkpoint-fold — the cadence counter for
    * reconciliation. Counting DRAINS (not deltas) matters because an idle
    * journaled drain appends no delta: were the cadence delta-based, a
    * quiet lake would never reconcile and a journal-invisible deletion
    * could stay in the manifest forever. Marker-file discipline as with
    * [[waveWatermark]] (create new before deleting old; max wins).
    */
  def refreshCount: Long =
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).map(_.getPath.getName)
      .collect { case n if n.startsWith("_refresh-") =>
        n.stripPrefix("_refresh-").toLong }
      .maxOption.getOrElse(0L)

  def bumpRefreshCount(): Long = {
    val n = refreshCount + 1
    fs.mkdirs(root)
    fs.create(new Path(root, s"_refresh-$n"), true).close()
    dropRefreshMarkers(keep = n)
    n
  }

  def resetRefreshCount(): Unit = dropRefreshMarkers(keep = -1L)

  private def dropRefreshMarkers(keep: Long): Unit =
    fs.listStatus(root).map(_.getPath).foreach { p =>
      if (p.getName.startsWith("_refresh-") &&
        p.getName.stripPrefix("_refresh-").toLong != keep)
        fs.delete(p, false)
    }

  // ---- legacy migration ----------------------------------------------------

  /** One-time upgrade from the pre-r9 layout (a plain parquet dir swapped
    * whole per drain): the legacy rows become the log's first delta, then
    * the legacy data files are removed from the root. Ordering keeps a
    * complete manifest readable at every instant — a crash after the delta
    * commit but before the cleanup leaves both present, and the next call
    * skips the re-commit (a delta already exists) and finishes the cleanup.
    * Steady-state cost is one `exists` check once migrated.
    */
  def migrateLegacy(): Unit = {
    Compaction.recover(spark, path) // finish a crashed LEGACY full-swap first
    val rootSuccess = new Path(root, "_SUCCESS")
    if (!fs.exists(rootSuccess)) return
    val legacyFiles = fs.listStatus(root).filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toIndexedSeq
    if (legacyFiles.nonEmpty && deltaSeqs.isEmpty && ckptUpto < 0) {
      val legacy = spark.read.parquet(legacyFiles: _*)
      commitDelta(legacy, Seq.empty)
    }
    legacyFiles.foreach(f => fs.delete(new Path(f), false))
    fs.delete(rootSuccess, false)
    ()
  }
}
