package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

/** Structural scale sweep over the STREAMING builders — the streaming twin
  * of `CatalogPlanSweepSpec` (which covers the 280 batch plans). Asserts on
  * ANALYZED plans, before any drain runs:
  *
  *  1. every stateful operator whose state grows with the event-time
  *     horizon (windowed aggregate, dropDuplicatesWithinWatermark,
  *     stream-stream join) has an `EventTimeWatermark` BELOW it — without
  *     one, state is unbounded and a 100 TB/day stream OOMs the executors;
  *  2. a stream-stream join has watermarks on BOTH inputs and a non-empty
  *     join condition (the interval bound Spark uses to expire join
  *     state);
  *  3. per-key processors (mapGroupsWithState / transformWithState /
  *     flatMapGroupsWithState) either sit above a watermark or are on the
  *     explicit KEY-BOUNDED allowlist: their state is O(#keys) by
  *     construction (one constant-size record per user), which is the
  *     documented bound — growing with the key domain, not with time.
  *
  * A future streaming query that adds an unwatermarked horizon-growing
  * stateful op fails this spec at test time, not at 3am on the cluster.
  */
class StreamingPlanSweepSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val d = Files.createTempDirectory("graft-sweep-src").toString
    Tables.events(spark, sf).limit(1000).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/in")
    s"$d/in"
  }

  private def streamEvents: DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
  }

  // ---- plan predicates -----------------------------------------------

  private def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  private def hasWatermark(p: LogicalPlan): Boolean =
    p.collect { case n if n.nodeName == "EventTimeWatermark" => n }.nonEmpty

  /** Horizon-growing stateful nodes: state size scales with (arrival rate ×
    * watermark horizon); these MUST have a watermark below them.
    */
  private val horizonStateful =
    Set("Aggregate", "Deduplicate", "DeduplicateWithinWatermark")

  /** Per-key processors: state is O(#keys); allowed without a watermark
    * only when listed in [[keyBoundedOk]].
    */
  private val perKeyStateful =
    Set("FlatMapGroupsWithState", "MapGroupsWithState", "TransformWithState")

  private final case class Violation(builder: String, node: String, why: String)

  private def sweep(builder: String, df: DataFrame,
      keyBoundedOk: Boolean = false): Seq[Violation] = {
    val plan = analyzed(df)
    assert(df.isStreaming, s"$builder: expected a streaming Dataset")
    plan.collect {
      // only STREAMING children need the watermark: typed processors carry
      // a second non-streaming child (the empty initial-state relation)
      case n if horizonStateful(n.nodeName) && n.isStreaming &&
          !n.children.filter(_.isStreaming).forall(hasWatermark) =>
        Violation(builder, n.nodeName,
          "horizon-growing state with no upstream watermark")
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
          !(hasWatermark(j.left) && hasWatermark(j.right)) =>
        Violation(builder, "Join",
          "stream-stream join without both-side watermarks")
      case j: Join if j.left.isStreaming && j.right.isStreaming &&
          j.condition.isEmpty =>
        Violation(builder, "Join",
          "stream-stream join without a state-expiring condition")
      case n if perKeyStateful.exists(n.nodeName.startsWith) && n.isStreaming &&
          !n.children.filter(_.isStreaming).forall(hasWatermark) &&
          !keyBoundedOk =>
        Violation(builder, n.nodeName,
          "per-key processor neither watermarked nor allowlisted key-bounded")
    }
  }

  private def assertClean(builder: String, df: DataFrame,
      keyBoundedOk: Boolean = false): Unit = {
    val v = sweep(builder, df, keyBoundedOk)
    assert(v.isEmpty, s"streaming scale violations: ${v.mkString("; ")}")
  }

  // ---- the sweep ------------------------------------------------------

  test("windowed aggregate drains are watermarked") {
    assertClean("hourlyAgg", EventsStream.hourlyAgg(streamEvents))
    // chained stateful: dedup establishes the one watermark, agg rides it
    assertClean("dedup→hourlyAggOn",
      EventsStream.hourlyAggOn(EventsStream.dedupStream(streamEvents)))
  }

  test("streaming dedup is within-watermark (bounded state)") {
    assertClean("dedupStream", EventsStream.dedupStream(streamEvents))
  }

  test("stream-stream interval joins: both sides watermarked, condition bounds state") {
    val src = streamEvents
    val clicks = src.filter(col("event_type") === "click")
    val purchases = src.filter(col("event_type") === "purchase")
    assertClean("clickAttribution",
      EventsStream.clickAttribution(clicks, purchases))
    assertClean("clickAttributionOuter",
      EventsStream.clickAttributionOuter(clicks, purchases))
  }

  test("stream-static enrichment carries no stateful operator at all") {
    val dim = Tables.customer(spark, sf).limit(100)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plan = analyzed(EventsStream.enrich(streamEvents, dim))
    val stateful = plan.collect {
      case n if (horizonStateful(n.nodeName) ||
        perKeyStateful.exists(n.nodeName.startsWith)) && n.isStreaming => n
      case j: Join if j.left.isStreaming && j.right.isStreaming => j
    }
    assert(stateful.isEmpty,
      s"enrich should be stateless per micro-batch, found: $stateful")
  }

  test("per-key processors: event-time-timeout ones watermarked; key-bounded ones allowlisted") {
    // sessionize uses EventTimeTimeout — the timeout NEEDS the watermark
    assertClean("sessionize",
      EventsStream.sessionize(spark, streamEvents).toDF())
    assertClean("sessionizeClosed",
      EventsStream.sessionizeClosed(spark, streamEvents).toDF())
    assertClean("interpolateStream",
      EventsStream.interpolateStream(spark, streamEvents,
        0L, 4, 60000L).toDF())
    // scd2 / runningTotals hold ONE constant-size record per user_id —
    // state is O(#users) regardless of stream length (the documented
    // key-bounded design, EventsStream.scala scaladoc); allowlisted.
    assertClean("scd2Stream",
      EventsStream.scd2Stream(spark, streamEvents).toDF(), keyBoundedOk = true)
    assertClean("runningTotals",
      EventsStream.runningTotals(spark, streamEvents).toDF(), keyBoundedOk = true)
  }

  test("the gate bites: an unwatermarked streaming window aggregate is flagged") {
    val bad = streamEvents
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val v = sweep("unwatermarked-agg", bad)
    assert(v.nonEmpty && v.head.why.contains("no upstream watermark"))
    // and an unwatermarked per-key processor is flagged unless allowlisted
    val badKeyed = EventsStream.scd2Stream(spark, streamEvents).toDF()
    assert(sweep("scd2-not-allowlisted", badKeyed).nonEmpty)
  }
}
