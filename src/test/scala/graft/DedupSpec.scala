package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinHashMerge, MinHashMergeOps}
import graft.functions.TextFunctions

/** Dedup operators: exactness, MinHash recall vs exact Jaccard, SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsWithDups = {
    val base = Tables.documents(spark, sf).limit(50)
    // clone 5 docs with tiny edits → guaranteed near-dups
    val clones = base.limit(5)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" extra")))
    base.unionByName(clones)
  }

  test("exact dedup collapses identical texts to the min doc_id") {
    val dup = Tables.documents(spark, sf).limit(10)
      .unionByName(Tables.documents(spark, sf).limit(10)
        .withColumn("doc_id", col("doc_id") + 1000L))
    val out = Dedup.exactTextKeyed(dup).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(1) == 2L)) // every text has 2 copies
    assert(out.forall(_.getLong(0) < 1000L)) // canonical = original id
  }

  test("exactByFingerprint agrees with exact dedup on group count") {
    val docs = Tables.documents(spark, sf)
    assert(Dedup.exactByFingerprint(docs).count() == Dedup.exactTextKeyed(docs).count())
  }

  test("verified fingerprint dedup reports zero collisions on the corpus") {
    val out = Dedup.exactByFingerprintVerified(Tables.documents(spark, sf))
    assert(out.filter(col("n_distinct_sha") > 1).count() == 0)
    assert(out.count() == Dedup.exactTextKeyed(Tables.documents(spark, sf)).count())
  }

  test("minhash finds planted near-duplicates") {
    val found = Dedup.minHashNearDups(docsWithDups, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // each planted clone pairs with its source (id, id+100000)
    (0 until 5).foreach { i =>
      assert(found.exists { case (a, b) => b == a + 100000L },
        s"planted dup missing: $found")
    }
  }

  test("minhash candidates are a superset of high-jaccard pairs (LSH recall)") {
    // shingleLen=1 makes the sketch unit = token sets, so exact tokenJaccard
    // is the ground truth for recall
    val docs = docsWithDups
    val cand = Dedup.minHashCandidates(docs, shingleLen = 1).as[(Long, Long)]
      .collect().toSet
    val a = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    val exact = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", TextFunctions.tokenJaccard(col("text_a"), col("text_b")))
      .filter(col("j") >= 0.95)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand), s"missed: ${exact -- cand}")
  }

  test("simhash of identical text is identical; near-dup pairs found") {
    val out = Dedup.simHashNearDups(docsWithDups, maxHamming = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.exists { case (a, b) => b == a + 100000L }, s"got: $out")
  }

  test("MinHashMerge aggregator: sig(A ∪ B) = min(sigA, sigB); incremental = batch") {
    import org.apache.spark.sql.functions.udaf
    val docs = Tables.documents(spark, sf).limit(40)
    val sigs = docs.select(col("lang"),
      Dedup.minHashSignature(col("text"), 2, 16).as("sig"))
    val mergeUdaf = udaf(MinHashMerge)
    // batch: merge everything per lang
    val batch = sigs.groupBy("lang").agg(mergeUdaf(col("sig")).as("msig"))
      .as[(String, Array[Long])].collect().toMap
    // incremental: merge two halves, then combine
    val h1 = sigs.limit(20).groupBy("lang").agg(mergeUdaf(col("sig")).as("m"))
      .as[(String, Array[Long])].collect().toMap
    val rest = sigs.exceptAll(sigs.limit(20)).groupBy("lang")
      .agg(mergeUdaf(col("sig")).as("m")).as[(String, Array[Long])].collect().toMap
    batch.foreach { case (lang, want) =>
      val a = h1.getOrElse(lang, Array.empty[Long])
      val b = rest.getOrElse(lang, Array.empty[Long])
      val got = if (a.isEmpty) b else if (b.isEmpty) a
        else a.zip(b).map { case (x, y) => math.min(x, y) }
      assert(got.sameElements(want), s"lang=$lang")
    }
    // estimator bounds
    val any = batch.values.head
    assert(MinHashMergeOps.estimateJaccard(any, any) == 1.0)
  }

  test("band index: incremental build + probe equals the one-shot pair set") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") < 400)
    val fresh = docs.filter(col("doc_id") >= 400)
    // build in two appends to prove incrementality
    Dedup.buildBandIndex(old.filter(col("doc_id") < 200), s"$tmp/idx")
    Dedup.buildBandIndex(old.filter(col("doc_id") >= 200), s"$tmp/idx")
    val probed = Dedup.probeBandIndex(fresh, spark, s"$tmp/idx", 0.5)
      .select("new_id", "indexed_id")
      .as[(Long, Long)].collect().toSet
    // reference: the same banding + sig-estimate computed in one shot
    val allBands = Dedup.minHashBands(docs)
    val a = allBands.select(col("band"), col("band_hash"), col("doc_id").as("new_id"))
    val b = allBands.select(col("band"), col("band_hash"), col("doc_id").as("indexed_id"))
    val sigs = docs.select(col("doc_id"),
      Dedup.minHashSignature(col("text"), 3, 24).as("sig"))
    val want = a.join(b, Seq("band", "band_hash"))
      .filter(col("new_id") >= 400 && col("indexed_id") < 400)
      .select("new_id", "indexed_id").distinct()
      .join(sigs.select(col("doc_id").as("new_id"), col("sig").as("s1")), "new_id")
      .join(sigs.select(col("doc_id").as("indexed_id"), col("sig").as("s2")), "indexed_id")
      .withColumn("est", size(filter(zip_with(col("s1"), col("s2"),
        (x, y) => x === y), m => m)).cast("double") / lit(24))
      .filter(col("est") >= 0.5)
      .select("new_id", "indexed_id").as[(Long, Long)].collect().toSet
    assert(probed == want)
    assert(probed.nonEmpty)
  }

  test("ngram jaccard finds the planted clones at high threshold") {
    // planted clones share all tokens except the appended one
    val docs = docsWithDups.withColumn("n_chars", length(col("text")))
    val found = Dedup.ngramJaccardPairs(docs, threshold = 0.8, lenBucket = 10000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(found.exists { case (a, b) => b == a + 100000L }, s"got: $found")
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark, not clean docs") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains the benchmark's first 8 tokens verbatim
      (1L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix tail"),
      // same vocabulary, different order: no shared 8-gram
      (2L, "theta eta zeta epsilon delta gamma beta alpha kappa iota junk"),
      (3L, "completely unrelated text with many distinct tokens here ok fine")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.decontaminate(docs, bench, n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) && !out(2L) && !out(3L))
  }

  test("bloom-prefiltered decontaminate is exact (equals the broadcast-join path)") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val plain = Dedup.decontaminate(corpus, bench, n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bloomed = Dedup.decontaminateBloom(corpus, bench, n = 8)
    // the probe is a map-side codegen filter on the gram scan, before any join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    val out = bloomed.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == plain)
    assert(out.values.exists(identity) && out.values.exists(!_),
      "fixture should have both contaminated and clean docs")
  }

  test("substring anchors: full density emits every window, content matches the slice") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val rows = Dedup.substringAnchorRows(docs, k = 4, w = 1)
      .orderBy("pos").collect()
    assert(rows.length == 7) // 10 - 4 + 1
    rows.foreach { r =>
      val pos = r.getInt(1)
      assert(r.getString(2) == "abcdefghij".substring(pos - 1, pos + 3))
    }
  }

  test("substring anchors: doc shorter than k yields no anchors") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(Dedup.substringAnchorRows(docs, k = 4, w = 1).count() == 0)
  }

  test("winnowing guarantee: any shared span of length >= k+w-1 is detected") {
    val (k, w) = (8, 4)
    val span = "SHAREDSPANXY" // length 12 >= k+w-1 = 11
    // the span sits at different offsets inside otherwise-unrelated text
    val docs = Seq(
      (1L, s"aquickbrownfox${span}jumpsoverthelazydog"),
      (2L, s"zz${span}completelyotherpayloadhere1234")
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(docs, k = k, w = w).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L,
      s"shared ${span.length}-char span must surface at k=$k w=$w")
  }

  test("winnowed pairs are a subset of full-density pairs with fewer anchors") {
    val docs = Tables.documents(spark, sf)
    def keyset(w: Int) = Dedup.substringDupPairs(docs, k = 32, w = w)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = keyset(1)
    val winnowed = keyset(16)
    assert(winnowed.subsetOf(full), "winnowed selection can only drop pairs")
    assert(winnowed.nonEmpty, "planted long-span dups must survive winnowing")
    val fullAnchors = Dedup.substringAnchorRows(docs, k = 32, w = 1).count()
    val winAnchors = Dedup.substringAnchorRows(docs, k = 32, w = 16).count()
    assert(winAnchors < fullAnchors / 4,
      s"w=16 should thin anchors to ~2/17 density ($winAnchors vs $fullAnchors)")
  }

  test("hot-anchor cap drops boilerplate anchors before pairing") {
    val boiler = "COMMONBOILERPLATECHUNK"
    val docs = (1L to 6L).map(i => (i, s"doc${i}unique${i}padding$boiler"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.substringDupPairs(docs, k = 8, w = 1)
    assert(uncapped.count() == 15) // all C(6,2) pairs share the chunk
    // every anchor here comes from the shared chunk (unique prefixes differ
    // in length, so shared windows are exactly the boilerplate suffix) →
    // capping at 3 docs per anchor removes all pairs
    val capped = Dedup.substringDupPairs(docs, k = 8, w = 1, maxDocsPerAnchor = 3)
    assert(capped.count() == 0)
  }
}
