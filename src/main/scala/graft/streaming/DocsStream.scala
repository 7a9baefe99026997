package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming document ingest: the classifier-gated quality filter applied
  * IN the stream — model inference (a codegen projection, no UDF, no
  * state) runs per micro-batch at scan speed, so corpus ingestion and
  * filtering happen in one pass as documents land. Drained with
  * AvailableNow (the reference's process-pending-then-stop loop,
  * sqoop_etl.py:77-83), output parquet — the batch/stream parity that
  * makes the result oracle-checkable.
  */
object DocsStream {

  /** Streaming near-dup INGEST GATE: drain arriving documents through
    * [[graft.dedup.Dedup.ingestGateBatch]] against a persistent band index
    * at `indexPath`, appending each micro-batch's bands+sigs after probing
    * it — the online half of the incremental-dedup story: new documents are
    * near-dup-checked against the base corpus AND every earlier arrival as
    * they land, without ever re-reading historical text. The emitted
    * canonical pair set is micro-batch-boundary independent (each pair is
    * evaluated exactly once, where its later member arrives), so the
    * drained output replays under the same mod-2^64 batch oracle.
    *
    * `indexPath` is MUTATED (append per batch): pass a
    * `graft.Fixtures.mutableCopy` of a shared index fixture, never the
    * fixture itself.
    */
  def neardupGateDrain(spark: SparkSession, inDir: String, indexPath: String,
      outDir: String, checkpoint: String, minEstJaccard: Double): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // Restart discipline (foreachBatch is at-least-once — a crashed
        // batch re-runs on the same id): pair output goes to a
        // per-batch-OVERWRITE partition dir, so a re-run replaces rather
        // than duplicates; the index append is guarded by a marker written
        // LAST, so a fully-applied batch is never appended twice. The one
        // remaining window (crash mid-append) can only duplicate index
        // rows, which the gate absorbs by construction: band candidates
        // are distinct()ed and duplicate sig rows only re-derive the same
        // pair into the same overwritten partition. The marker carries the
        // CHECKPOINT identity, not just the batch id: a reset checkpoint
        // restarts ids at 0, and a bare-id marker would then silently skip
        // the new batches' index appends. (Resetting a checkpoint against
        // an already-used outDir still overwrites its batch=N partitions —
        // pair outputs need a fresh outDir per checkpoint lineage.)
        val ckTag = java.security.MessageDigest.getInstance("SHA-256")
          .digest(checkpoint.getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_applied_${ckTag}_$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // compute the signature kernel ONCE per arriving doc and pin it:
        // bands, in-batch + index-probe estimates, and the index append all
        // derive from this one frame
        val sigs = batch.select(col("doc_id"),
          graft.dedup.Dedup.minHashSignature(col("text"), 3, 24).as("sig"))
          .persist()
        try {
          graft.dedup.Dedup.ingestGateFromSigs(sigs, spark, indexPath, minEstJaccard)
            .distinct()
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          if (!fs.exists(marker)) {
            graft.dedup.Dedup.appendSigsToIndex(sigs, indexPath)
            fs.create(marker, true).close()
          }
        } finally { sigs.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Streaming VISUAL ingest gate: drain arriving image payloads through
    * [[graft.multimodal.VisualIndex.gateBatch]] against a persistent dHash
    * quarter index — the perceptual twin of [[neardupGateDrain]], same
    * restart discipline (per-batch overwrite output, checkpoint-tagged
    * append marker written last), same exactly-once pair semantics. The
    * decode+dHash kernel runs ONCE per arriving image; only 16-byte
    * (doc_id, sig) rows reach the index and the pair shuffles.
    *
    * `indexPath` is MUTATED (append per batch): pass a
    * `graft.Fixtures.mutableCopy` of a shared fixture, never the fixture.
    */
  def visualGateDrain(spark: SparkSession, inDir: String, indexPath: String,
      outDir: String, checkpoint: String, maxHamming: Int): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val ckTag = java.security.MessageDigest.getInstance("SHA-256")
          .digest(checkpoint.getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
        val marker = new org.apache.hadoop.fs.Path(
          s"$indexPath/_applied_${ckTag}_$batchId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val sigs = graft.multimodal.Multimodal.imageDhash(batch).persist()
        try {
          graft.multimodal.VisualIndex
            .gateBatch(sigs, spark, indexPath, maxHamming)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          if (!fs.exists(marker)) {
            graft.multimodal.VisualIndex.append(sigs, indexPath)
            fs.create(marker, true).close()
          }
        } finally { sigs.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Streaming crawl-archive ingest: a landing directory of `.warc.gz`
    * files IS the stream — the binaryFile file source fans out one task
    * per newly-arrived archive (the shard-granular unit; an archive is
    * non-splittable either way), the Warc codec parses it inside the
    * micro-batch, and extracted documents land in parquet. Checkpointed
    * file tracking gives exactly-once per archive: a drain→new-files→drain
    * cycle on one checkpoint ingests every archive exactly once (proven by
    * the declared query's two-wave drive). This is the production shape of
    * continuous crawl ingestion — files land, documents flow, nothing
    * re-reads history.
    */
  def warcIngestDrain(spark: SparkSession, inGlob: String, outDir: String,
      checkpoint: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val stream = spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", "2")
      .load(inGlob)
    val q = stream.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        graft.sources.Warc.parse(graft.sources.Codecs.decodeBytes(p, bytes))
      }
      .toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Streaming crawl CURATION: the [[warcIngestDrain]] parse composed with
    * the published Gopher rule gate (quality.RuleFilters — integer-rule
    * codegen projection) in ONE drain: archives land, documents flow out
    * already gated, rejects never hit the sink. Both stages are map-only,
    * so the whole online pipeline is stateless — exactly-once comes from
    * the file-source checkpoint alone.
    */
  def crawlCurateDrain(spark: SparkSession, inGlob: String, outDir: String,
      checkpoint: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val docs = spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", "2")
      .load(inGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        graft.sources.Warc.parse(graft.sources.Codecs.decodeBytes(p, bytes))
      }
      .toDF()
    val gated = graft.quality.RuleFilters.gopher(docs).filter(col("keep"))
      .select("doc_id", "lang", "source", "text")
    val q = gated.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Stream documents through the hashed-linear quality gate to parquet. */
  def classifyDrain(spark: SparkSession, sfDir: String, outDir: String,
      checkpoint: String): Unit = {
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sfDir/documents*.parquet")
    val score = graft.quality.LinearScorer.score(col("text"))
    val q = stream
      .select(col("doc_id"), col("lang"), score.as("w_sum"))
      .filter(col("w_sum") > 0)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
