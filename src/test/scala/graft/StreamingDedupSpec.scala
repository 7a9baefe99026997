package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStream

class StreamingDedupSpec extends SparkSpec {

  test("stream-stream interval join equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    val src = EventsStream.readEvents(spark, sf)
    val joined = EventsStream.clickAttribution(
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "purchase"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val got = spark.table("attr_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch ground truth with identical predicates
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("purchase_ts"))
    val want = c.join(p,
      col("user_id") === col("pu") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // append-mode emits pairs whose watermark closed; everything emitted must
    // be correct, and most of the batch result must be present
    assert(got.subsetOf(want))
    assert(got.size >= want.size / 2, s"got ${got.size} of ${want.size}")
  }

  test("streaming dedup within watermark drops re-delivered event ids") {
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    // duplicate the source files: same event_ids delivered twice in one batch
    val src = s"$tmp/in"
    val events = Tables.events(spark, sf)
    events.write.mode("overwrite").parquet(src)
    events.write.mode("append").parquet(src)
    val raw = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
    val q = EventsStream.dedupStream(raw).writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ck")
      .start()
    q.awaitTermination()
    val got = spark.table("dedup_out").count()
    assert(got == events.count(), s"expected ${events.count()} unique, got $got")
  }

  test("streaming near-dup ingest gate equals a single-batch gate replay") {
    import org.apache.spark.sql.functions._
    val drained = SparkEntry.queries("q_stream_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // one-shot replay: the whole arriving set as a SINGLE batch against a
    // fresh copy of the same base index — if the drained multi-micro-batch
    // set equals this, the emitted pairs are batch-boundary independent
    val docs = Tables.documents(spark, sf)
    val baseIdx = Fixtures.getOrBuild(s"bandidx:$sf") { f =>
      graft.dedup.Dedup.buildBandIndex(
        docs.filter(col("doc_id") < 400), f, mode = "overwrite")
    }
    val idx = Fixtures.mutableCopy(baseIdx)
    val want = graft.dedup.Dedup.ingestGateBatch(
        docs.filter(col("doc_id") >= 400), spark, idx, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(drained.nonEmpty)
    assert(drained == want)
  }

  test("near-dup gate resumes across a restart: two drains over arriving waves equal one shot") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-sgate2").toString
    val docs = Tables.documents(spark, sf)
    val baseIdx = Fixtures.getOrBuild(s"bandidx:$sf") { f =>
      graft.dedup.Dedup.buildBandIndex(
        docs.filter(col("doc_id") < 400), f, mode = "overwrite")
    }
    val idx = Fixtures.mutableCopy(baseIdx)
    val stream = docs.filter(col("doc_id") >= 400)
    // wave 1 arrives and is drained; the process "restarts"; wave 2 arrives
    // and the second drain resumes from the same checkpoint with the index
    // already reflecting wave 1
    stream.filter(col("doc_id") < 450).repartition(4).write.parquet(s"$tmp/in")
    graft.streaming.DocsStream.neardupGateDrain(
      spark, s"$tmp/in", idx, s"$tmp/out", s"$tmp/ck", 0.5)
    stream.filter(col("doc_id") >= 450).repartition(4)
      .write.mode("append").parquet(s"$tmp/in")
    graft.streaming.DocsStream.neardupGateDrain(
      spark, s"$tmp/in", idx, s"$tmp/out", s"$tmp/ck", 0.5)
    val got = spark.read.parquet(s"$tmp/out")
      .select("hi_id", "lo_id", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idx2 = Fixtures.mutableCopy(baseIdx)
    val want = graft.dedup.Dedup.ingestGateBatch(stream, spark, idx2,
        minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("visual gate resumes across a restart: two waves equal one-shot gate") {
    import org.apache.spark.sql.functions._
    import graft.multimodal.{Multimodal, PixelCodec, VisualIndex}
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-vgate2").toString
    // grouped BMPs: same group → identical pixels → Hamming 0 pairs
    def payloads(ids: Seq[Long]) = ids.map { id =>
      val g = (id % 5).toInt
      val pix = Array.tabulate(10 * 8 * 3)(i => ((g * 37 + i * 11) % 256).toByte)
      (id, PixelCodec.encodeBmp(10, 8, pix))
    }.toDF("doc_id", "payload")
    val idx = s"$tmp/idx"
    VisualIndex.build(Multimodal.imageDhash(payloads(0L until 10L)), idx)
    payloads(10L until 20L).repartition(3).write.parquet(s"$tmp/in")
    graft.streaming.DocsStream.visualGateDrain(
      spark, s"$tmp/in", idx, s"$tmp/out", s"$tmp/ck", maxHamming = 3)
    payloads(20L until 30L).repartition(3)
      .write.mode("append").parquet(s"$tmp/in")
    graft.streaming.DocsStream.visualGateDrain(
      spark, s"$tmp/in", idx, s"$tmp/out", s"$tmp/ck", maxHamming = 3)
    val got = spark.read.parquet(s"$tmp/out")
      .select("hi_id", "lo_id", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // one-shot ground truth: fresh base index, all arrivals as one batch
    val idx2 = s"$tmp/idx2"
    VisualIndex.build(Multimodal.imageDhash(payloads(0L until 10L)), idx2)
    val want = VisualIndex.gateBatch(
        Multimodal.imageDhash(payloads(10L until 30L)), spark, idx2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.nonEmpty)
    assert(got == want)
    // every arrival with a same-group base image found its base near-dup
    assert((10L until 30L).forall(a =>
      got.exists(p => p._1 == a && p._2 % 5 == a % 5)))
  }
}
