package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin
import graft.pipeline.TokenBudget

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a a a a", "en"), (2L, "b b b", "en"), (3L, "c c", "en"),
    (4L, "d d d d d", "fr"), (5L, "e", "fr"), (6L, "f f f", "fr")
  ).toDF("doc_id", "text", "lang")

  test("token budget: cumulative tokens never exceed the lang budget") {
    val sel = TokenBudget.sample(docs, Map("en" -> 7L), defaultBudget = 6L)
      .collect()
    val byLang = sel.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val budget = if (lang == "en") 7L else 6L
      assert(rows.map(_.getLong(4)).max <= budget)
    }
    // selection is a PREFIX of the hash order: ranks are 1..n with no holes
    byLang.foreach { case (_, rows) =>
      val rks = rows.map(_.getLong(1)).sorted
      assert(rks.sameElements(1L to rks.length))
    }
  }

  test("token budget: selection is partitioning-independent") {
    val a = TokenBudget.sample(docs, Map.empty, 6L)
      .collect().map(_.toString).sorted
    val b = TokenBudget.sample(docs.repartition(7), Map.empty, 6L)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("token budget accounting: within_budget true, totals consistent") {
    val sel = TokenBudget.sample(docs, Map("en" -> 7L), 6L)
    val acc = TokenBudget.accounting(sel, Map("en" -> 7L), 6L).collect()
    assert(acc.nonEmpty && acc.forall(_.getBoolean(3)))
  }

  test("count-min: estimate >= true count for every key; heavy keys within bound") {
    val words = Seq.fill(50)("hot") ++ (1 to 40).map(i => s"w$i") ++
      Seq.fill(20)("warm")
    val df = words.toDF("token")
    val sketch = CountMin.fit(df, "token", depth = 4, width = 64)
    assert(sketch.total == words.length)
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct()
      .select(col("token"), CountMin.estimate(sketch, col("token")).as("est"))
      .as[(String, Long)].collect().toMap
    truth.foreach { case (w, n) => assert(est(w) >= n, s"underestimate for $w") }
    val bound = CountMin.errorBound(sketch)
    assert(est("hot") <= truth("hot") + bound)
    assert(est("warm") <= truth("warm") + bound)
  }

  test("count-min: fromCounts equals fit, and sketches are mergeable by addition") {
    val df = (Seq.fill(10)("x") ++ Seq.fill(5)("y") ++ Seq("z")).toDF("token")
    val viaFit = CountMin.fit(df, "token", depth = 3, width = 32)
    val viaCounts = CountMin.fromCounts(
      df.groupBy("token").agg(count(lit(1)).as("n")), "token", "n", 3, 32)
    assert(viaFit.total == viaCounts.total)
    viaFit.tables.zip(viaCounts.tables).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    // split the rows, sketch each half, add counter-wise == sketch of whole
    val (h1, h2) = (df.filter(col("token") =!= "x"), df.filter(col("token") === "x"))
    val s1 = CountMin.fit(h1, "token", 3, 32)
    val s2 = CountMin.fit(h2, "token", 3, 32)
    val merged = viaFit.tables.indices.map { r =>
      s1.tables(r).zip(s2.tables(r)).map { case (a, b) => a + b }
    }
    merged.zip(viaFit.tables).foreach { case (m, w) => assert(m.sameElements(w)) }
  }

  test("bpe pairs: counts weighted by word frequency, vocab-collapsed") {
    // vocab: "abc"×3, "ab"×1 → pairs: ab = 3+1 = 4, bc = 3
    val in = Seq((1L, "abc ab abc"), (2L, "abc x")).toDF("doc_id", "text")
    val out = graft.pipeline.BpePairs.pairCounts(in)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ab" -> 4L, "bc" -> 3L)) // "x" filtered: length < 2
  }

  test("shard interleave: per-lang counts balanced to within one; deterministic") {
    val many = (1L to 103L).map(i => (i, s"t$i", if (i % 3 == 0) "fr" else "en"))
      .toDF("doc_id", "text", "lang")
    val a = graft.pipeline.Sharding.interleave(many, nShards = 4)
    val counts = a.groupBy("lang", "shard").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq("en", "fr").foreach { l =>
      val per = (0L until 4L).map(sh => counts.getOrElse((l, sh), 0L))
      assert(per.max - per.min <= 1, s"$l unbalanced: $per")
    }
    // assignment independent of input partitioning
    val b = graft.pipeline.Sharding.interleave(many.repartition(7), nShards = 4)
    assert(a.orderBy("doc_id").collect().sameElements(b.orderBy("doc_id").collect()))
  }

  test("boilerplate removal drops frequent chunks, keeps order, counts exactly") {
    // chunkLen=2 → chunks: doc1 ["x y","x y","u v"], doc2 ["x y","p q"],
    // doc3 ["x y","r s"]; "x y" has df=3 > maxDf=2 → removed everywhere
    val in = Seq(
      (1L, "x y x y u v"), (2L, "x y p q"), (3L, "x y r s")
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Boilerplate.removeFrequentChunks(in, chunkLen = 2, maxDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "u v")))
    assert(out(1) == ((2L, 2L, 1L, "p q")))
    assert(out(2) == ((3L, 2L, 1L, "r s")))
    // partial (map-side) aggregation feeds the chunk-frequency shuffle
    val plan = graft.pipeline.Boilerplate.removeFrequentChunks(in)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"expected partial aggregate:\n$plan")
  }

  test("url curate: canonicalization is idempotent and elects one winner per canonical url") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf)
    val curated = graft.pipeline.UrlCurate.curate(d)
    // exactly one keeper per canonical URL
    val bad = curated.groupBy("canon_url")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .filter(col("n_keep") =!= 1L).count()
    assert(bad === 0L)
    // canonicalizing an already-canonical URL is the identity
    val (recanon, _) = graft.pipeline.UrlCurate.canonicalize(col("canon_url"))
    val changed = curated.select(col("canon_url"), recanon.as("again"))
      .filter(col("canon_url") =!= col("again")).count()
    assert(changed === 0L)
    // the messy artifacts are gone from every canonical form — DEFAULT
    // ports, that is: https://host:80 is a non-default port and must stay
    val dirty = curated.filter(
      col("canon_url").rlike("WWW|utm_|fbclid|gclid|#") ||
        col("canon_url").rlike("^https://[^/]*:443") ||
        col("canon_url").rlike("^http://[^/]*:80")).count()
    assert(dirty === 0L)
    // and dup pressure is real: fewer canonical urls than docs
    assert(curated.select("canon_url").distinct().count() < d.count())
  }
}
