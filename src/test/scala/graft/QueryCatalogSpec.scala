package graft

import graft.multimodal.Multimodal

/** Smoke over the whole declared surface at sf0.001 + targeted invariants.
  * (Value-level correctness is the driver's DuckDB gate; `tools/
  * oracle_check.py` runs the same comparison locally.)
  */
class QueryCatalogSpec extends SparkSpec {

  test("every declared query runs and every oracle key has a query") {
    assert(QueryCatalog.oracleSql.keySet.subsetOf(QueryCatalog.queries.keySet))
    QueryCatalog.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute without throwing
    }
  }

  test("join cardinality estimate equals the materialized self-join size") {
    import org.apache.spark.sql.functions._
    val a = Tables.lineitem(spark, sf).select(col("l_partkey").as("k1"))
    val b = Tables.lineitem(spark, sf).select(col("l_partkey").as("k2"))
    val actual = a.join(b, col("k1") === col("k2")).count()
    val r = QueryCatalog.queries("q_join_cardinality")(spark, sf).head()
    assert(r.getAs[Long]("join_rows") === actual)
    assert(r.getAs[Long]("input_rows") ===
      Tables.lineitem(spark, sf).count())
  }

  test("approx_count_distinct is within tolerance of exact (emitted check)") {
    val rows = QueryCatalog.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_tol"), s"group ${r.get(0)} outside tolerance")
    }
  }

  test("graft expressions are callable from pure SQL after registration") {
    import org.apache.spark.sql.graftx.GraftFunctions
    GraftFunctions.registerAll(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_sql")
    val out = spark.sql(
      """SELECT doc_id, rolling_hash(text) AS fp, simhash64(text) AS sh,
        |  size(minhash_sig(text)) AS k
        |FROM docs_sql""".stripMargin).collect()
    assert(out.length == 5 && out.forall(_.getInt(3) == 24))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("multimodal resize + frame sampling keep row/frame accounting") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(10)
    val withBin = Multimodal.withPayload(docs)
    val resized = Multimodal.resize(withBin, 64, 64).collect()
    assert(resized.length == 10 && resized.forall(r => r.width == 64 && r.payload.nonEmpty))
    val frames = Multimodal.sampleFrames(withBin, stride = 2)
    val perDoc = frames.groupBy("docId").count().collect()
    assert(perDoc.length == 10)
    // every 2nd 256-byte block: ceil(ceil(len/256)/2) frames per doc
    val lens = withBin.select(col("doc_id"), octet_length(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    perDoc.foreach { r =>
      val blocks = (lens(r.getLong(0)) + 255) / 256
      assert(r.getLong(1) == (blocks + 1) / 2)
    }
  }

  test("char shingles produce all length-n substrings distinctly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s = Seq("abcd").toDF("t")
      .select(graft.functions.TextFunctions.charShingles(col("t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(s == Seq("abc", "bcd"))
  }

  test("training pipeline writes a lang-partitioned corpus that prunes on lang") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tdp").toString
    graft.pipeline.TrainingDataPipeline.run(Tables.documents(spark, sf), tmp)
    val back = spark.read.parquet(tmp)
    val one = back.filter(col("lang") === "en")
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val summary = graft.pipeline.TrainingDataPipeline.summary(Tables.documents(spark, sf))
    val wantEn = summary.filter(col("lang") === "en").head().getLong(1)
    assert(one.count() == wantEn)
  }

  test("multimodal feature extraction is deterministic and typed") {
    val docs = Tables.documents(spark, sf).limit(20)
    val a = Multimodal.extractFeatures(Multimodal.withPayload(docs)).collect()
    val b = Multimodal.extractFeatures(Multimodal.withPayload(docs)).collect()
    assert(a.map(_.sha).sorted.sameElements(b.map(_.sha).sorted))
    assert(a.forall(_.features.length == 8))
    assert(a.forall(m => m.byteLen > 0 && m.sha.length == 64))
  }
}
