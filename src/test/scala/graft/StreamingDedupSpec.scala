package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStream

class StreamingDedupSpec extends SparkSpec {

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
}
