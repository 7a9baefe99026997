package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStream

/** Streaming surface: AvailableNow drain (the reference's loop semantics),
  * watermarked windows, stateful sessionization.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("hourly agg over the stream equals the batch groupBy") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val streamed = EventsStream.hourlyAgg(EventsStream.readEvents(spark, sf))
    val q = streamed.writeStream
      .outputMode("append")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val got = spark.table("hourly_out")
      .agg(sum("n")).head().getLong(0)
    // watermark append-mode emits only closed windows; all but the last
    // window's worth of events must be present
    val total = Tables.events(spark, sf).count()
    assert(got > 0 && got <= total)
  }

  test("stream-static enrichment join equals the batch join") {
    val tmp = Files.createTempDirectory("graft-enrich").toString
    val batch = Tables.events(spark, sf)
    val dim = batch.groupBy("user_id")
      .agg(sum("value").as("lifetime_value"))
    val streamed = EventsStream.enrich(EventsStream.readEvents(spark, sf), dim)
    val q = streamed.writeStream
      .outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val out = spark.table("enrich_out")
    assert(out.count() == batch.count())
    // every user exists in the dim, so no enrichment may be null
    assert(out.filter(col("lifetime_value").isNull).isEmpty)
  }

  test("sessionize emits per-user session rows") {
    val tmp = Files.createTempDirectory("graft-sess").toString
    val ds = EventsStream.sessionize(spark, EventsStream.readEvents(spark, sf))
    val q = ds.writeStream
      .outputMode("update")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val out = spark.table("sess_out")
    assert(out.count() > 0)
    assert(out.select("userId").distinct().count() ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("flatMapGroupsWithState emits only closed sessions, matching batch sessions") {
    val tmp = Files.createTempDirectory("graft-sessclosed").toString
    val ds = EventsStream.sessionizeClosed(spark, EventsStream.readEvents(spark, sf))
    val q = ds.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_closed_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val out = spark.table("sess_closed_out")
    assert(out.count() > 0)
    // every closed session IS a batch-computed session (same user, start,
    // end, and event count), computed with the same 30-min gap rule
    val batchSessions = QueryCatalog.queries("q_sessionize")(spark, sf)
      .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val closed = out.select(col("user_id"), col("start_ms"), col("end_ms"),
      col("n_events")).as[(Long, Long, Long, Long)].collect().toSet
    assert(closed.subsetOf(batchSessions),
      s"closed sessions not found in batch: ${(closed -- batchSessions).take(3)}")
  }

  test("runAvailableNow drains to parquet and is restartable (checkpoint no-ops)") {
    val tmp = Files.createTempDirectory("graft-avail").toString
    EventsStream.runAvailableNow(spark, sf, s"$tmp/out", s"$tmp/ck")
    val n1 = spark.read.parquet(s"$tmp/out").count()
    // second run: checkpoint says everything is processed → no new rows
    EventsStream.runAvailableNow(spark, sf, s"$tmp/out", s"$tmp/ck")
    val n2 = spark.read.parquet(s"$tmp/out").count()
    assert(n1 == n2)
  }

  test("foreachBatch upsert is idempotent under checkpoint-replay of a batch") {
    // The crash window foreachBatch leaves open: deltas appended, then the
    // process dies BEFORE the batch's commit marker lands. On restart Spark
    // re-executes that batch (at-least-once), appending duplicate deltas.
    // Exactly-once-in-EFFECT holds because the version is derived from the
    // data (ms×10⁶ + event_id), not the batch id: replayed rows are
    // byte-identical and merge-on-read latest() collapses them.
    val tmp = Files.createTempDirectory("graft-replay").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    ev.repartition(4).write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    EventsStream.upsertStream(spark, s"$tmp/in", schema, s"$tmp/delta", s"$tmp/ck")
    def resolved() = graft.etl.MergeOnRead.latest(
        spark.read.parquet(s"$tmp/delta"), keys = Seq("user_id"), version = "version")
      .orderBy("user_id").collect().map(_.toString).toSeq
    val before = resolved()
    val deltasBefore = spark.read.parquet(s"$tmp/delta").count()
    // simulate the crash: drop the LAST batch's commit marker
    val commits = new java.io.File(s"$tmp/ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.length >= 2, "expected >=2 micro-batches (maxFilesPerTrigger=2)")
    assert(commits.last.delete())
    // drop the Hadoop checksum shadow too, or the local FS refuses the
    // replayed batch's atomic commit rename (stale .crc → "already exists")
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    EventsStream.upsertStream(spark, s"$tmp/in", schema, s"$tmp/delta", s"$tmp/ck")
    val deltasAfter = spark.read.parquet(s"$tmp/delta").count()
    assert(deltasAfter > deltasBefore,
      s"replay must re-append the uncommitted batch's deltas ($deltasBefore -> $deltasAfter)")
    assert(resolved() == before,
      "merge-on-read state must be unchanged by the replayed batch")
  }

  test("streaming scd2 emits exactly the batch build's closed versions") {
    val tmp = Files.createTempDirectory("graft-sscd2t").toString
    val q = EventsStream.scd2Stream(spark, EventsStream.readEvents(spark, sf))
      .writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("user_id", "event_type", "version", "from_us", "to_us")
      .orderBy("user_id", "version").collect().toSeq
    val batch = graft.etl.Scd2.build(
        Tables.events(spark, sf)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        Seq("user_id"), "event_type", "ts", Seq("event_id"))
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("event_type"), col("version"),
        unix_micros(col("valid_from")).as("from_us"),
        unix_micros(col("valid_to")).as("to_us"))
      .orderBy("user_id", "version").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming timeseries interpolation equals the batch twin bit-for-bit") {
    val streamed = SparkEntry.queries("q_stream_interp")(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("q_timeseries_interp")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch) // same rows, same order, same doubles/nulls
  }

  test("interpolation is batch-boundary and arrival-order independent (watermark-gated buffer)") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-sinterp2").toString
    val ev = Tables.events(spark, sf)
    val maxTms = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_millis(lit(maxTms + 200L * 86400000L)).as("ts"),
      lit(-1L).as("user_id"), lit("purchase").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
    // scatter rows across 6 files keyed on event_id, so every user's series
    // arrives interleaved and out of time order, one file per micro-batch.
    // The flush sentinel is written as a LATER file: a flush marker that
    // arrived before the data it flushes would advance the watermark past
    // every real point and turn them all late — order matters for the
    // sentinel exactly because it is the stream's end-of-input signal.
    ev.repartition(6, pmod(col("event_id"), lit(6)))
      .write.parquet(s"$tmp/in")
    sentinel.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val out = graft.streaming.EventsStream.interpolateStream(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in"),
      t0 = 1704067200000L, nSlices = 31, stepMs = 86400000L,
      watermarkDelay = "90 days") // disorder spans ~30 days — nothing late
    val q = out.writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("slice_ms"), col("v_interp"))
      .orderBy("user_id", "slice_ms").collect().toSeq
    val batch = SparkEntry.queries("q_timeseries_interp")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch) // bit-for-bit despite shuffled multi-batch arrival
  }

  test("stream-side purge equals the batch anti-join and survives a re-drain") {
    val tmp = Files.createTempDirectory("graft-spurge").toString
    val condemned = Tables.events(spark, sf).select(col("user_id"))
      .filter(pmod(col("user_id"), lit(19)) === 3).distinct()
    EventsStream.purgeDrain(spark, sf, condemned, s"$tmp/out", s"$tmp/ck")
    def surviving() = spark.read.parquet(s"$tmp/out")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = surviving()
    val expect = Tables.events(spark, sf)
      .filter(pmod(col("user_id"), lit(19)) =!= 3)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // re-drain against the same checkpoint: no new input → no duplicates
    EventsStream.purgeDrain(spark, sf, condemned, s"$tmp/out", s"$tmp/ck")
    assert(surviving() == expect)
    assert(spark.read.parquet(s"$tmp/out").count() == expect.size)
  }
}
