package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Packing

/** The packing manifest must be a perfect tiling: every document token
  * lands in exactly one window span, every window is exactly seqLen tokens
  * (except each shard's last), and spans are contiguous both within a
  * document and within a window.
  */
class PackingSpec extends SparkSpec {
  private val L = 32
  private val Shards = 4

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val manifest = Packing.packManifest(docs, L, Shards).cache()

  test("every document's spans cover its tokens (incl. EOS) exactly once, in order") {
    val perDoc = manifest
      .groupBy("doc_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("covered"),
        min("tok_from").as("first"), max("tok_to").as("last"),
        count(lit(1)).as("n_spans"))
    val expected = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) + 1).cast("long").as("ntok"))
    val bad = perDoc.join(expected, "doc_id")
      .filter(col("covered") =!= col("ntok") || col("first") =!= 0 ||
        col("last") =!= col("ntok"))
    assert(bad.isEmpty, bad.take(3).mkString(";"))
  }

  test("every window is exactly seqLen tokens except each shard's last") {
    val winSize = manifest
      .groupBy("shard", "window_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("fill"))
    val lastWin = manifest.groupBy("shard")
      .agg(max("window_id").as("last_w"))
    val bad = winSize.join(lastWin, "shard")
      .filter(col("window_id") =!= col("last_w") && col("fill") =!= L)
    assert(bad.isEmpty, bad.take(3).mkString(";"))
    // and the final windows' fill matches packStats padding
    val pad = Packing.packStats(docs, L, Shards)
      .select(col("shard"), (lit(L.toLong) - col("padding")).as("fill_expect"))
    val badLast = winSize.join(lastWin, "shard")
      .filter(col("window_id") === col("last_w"))
      .join(pad, "shard")
      .filter(col("fill") =!= col("fill_expect"))
    assert(badLast.isEmpty, badLast.take(3).mkString(";"))
  }

  test("spans tile each window contiguously from its start") {
    // within a window, ordering docs by win_offset: each span starts where
    // the previous ended, and the first starts at 0
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard", "window_id").orderBy("win_offset")
    val bad = manifest
      .withColumn("prev_end",
        lag(col("win_offset") + col("tok_to") - col("tok_from"), 1, 0L).over(w))
      .filter(col("win_offset") =!= col("prev_end"))
    assert(bad.isEmpty, bad.take(3).mkString(";"))
  }

  test("append continues each shard's stream: wave manifest == from-scratch manifest of the wave") {
    val hist = docs.filter(col("doc_id") < 200)
    val wave = docs.filter(col("doc_id") >= 200)
    val appended = Packing.packAppend(wave,
      Packing.packStats(hist, L, Shards).select(col("shard"), col("n_tokens")),
      L, Shards)
    val fromScratch = Packing.packManifest(docs, L, Shards)
      .filter(col("doc_id") >= 200)
    assert(appended.exceptAll(fromScratch).isEmpty &&
      fromScratch.exceptAll(appended).isEmpty)
    // and history's own manifest is untouched by the append (append-only)
    val histAlone = Packing.packManifest(hist, L, Shards)
    val histInFull = Packing.packManifest(docs, L, Shards)
      .filter(col("doc_id") < 200)
    assert(histAlone.exceptAll(histInFull).isEmpty &&
      histInFull.exceptAll(histAlone).isEmpty)
    // empty wave: zero rows, no error
    assert(Packing.packAppend(docs.filter(col("doc_id") < 0),
      Packing.packStats(hist, L, Shards).select(col("shard"), col("n_tokens")),
      L, Shards).isEmpty)
  }

  test("append precondition: totals with max_doc_id accept ordered waves, fail out-of-order ones") {
    val hist = docs.filter(col("doc_id") < 200)
    val totals = Packing.packTotals(hist, Shards)
    // ordered wave through the guarded path ≡ unguarded path
    val wave = docs.filter(col("doc_id") >= 200)
    val guarded = Packing.packAppend(wave, totals, L, Shards)
    val unguarded = Packing.packAppend(wave,
      totals.select(col("shard"), col("n_tokens")), L, Shards)
    assert(guarded.exceptAll(unguarded).isEmpty &&
      unguarded.exceptAll(guarded).isEmpty)
    // a wave containing a doc_id at-or-below history's max fails LOUDLY
    val bad = docs.filter(col("doc_id") < 100) // entirely inside history
    val ex = intercept[Exception] {
      Packing.packAppend(bad, totals, L, Shards).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("does not follow historical max")), ex.getMessage)
  }

  test("balanced assignment: every doc exactly once, tighter token balance than hash, gated max/mean") {
    val G = 2
    val assigned = Packing.balancedAssign(docs, Shards, G).cache()
    // partition property: every doc assigned to exactly one in-range shard
    assert(assigned.count() == docs.count())
    assert(assigned.filter(col("shard") < 0 || col("shard") >= Shards).isEmpty)
    def ratio(a: org.apache.spark.sql.DataFrame): Double = {
      val r = Packing.shardBalance(a)
        .agg(max("n_tokens").cast("double"), avg("n_tokens")).head()
      r.getDouble(0) / r.getDouble(1)
    }
    val balanced = ratio(assigned)
    val hashed = ratio(
      docs.select(col("doc_id"),
        (size(split(col("text"), " ")) + 1).cast("long").as("ntok"),
        pmod(col("doc_id"), lit(Shards.toLong)).as("shard")))
    // the gate the pipeline runs at scale: max shard stays within 5% of
    // mean, and never worse than the hash assignment it replaces
    assert(balanced <= 1.05, s"balanced max/mean=$balanced")
    assert(balanced <= hashed + 1e-9, s"balanced=$balanced vs hash=$hashed")
    // and the balanced manifest still tiles: spans cover each doc's tokens
    // exactly once (same invariant as packManifest)
    val m = Packing.packManifestBalanced(docs, L, Shards, G)
    val perDoc = m.groupBy("doc_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("covered"))
    val expected = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) + 1).cast("long").as("ntok"))
    assert(perDoc.join(expected, "doc_id")
      .filter(col("covered") =!= col("ntok")).isEmpty)
    assigned.unpersist()
  }

  test("stats: windows = ceil(tokens/L) per shard; padding < L") {
    val stats = Packing.packStats(docs, L, Shards).collect()
    assert(stats.length == Shards)
    stats.foreach { r =>
      val (tokens, windows, padding) =
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_windows"),
          r.getAs[Long]("padding"))
      assert(windows == (tokens + L - 1) / L)
      assert(padding == windows * L - tokens && padding >= 0 && padding < L)
    }
  }
}
