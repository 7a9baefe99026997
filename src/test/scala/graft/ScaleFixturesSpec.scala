package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The sf1 rehearsal fixtures must scale the WORKLOAD the way a real 10×
  * corpus would: row counts ×factor, keys disjoint across replicas, text
  * length/token structure preserved per replica, vectors decorrelated but
  * norm-preserved, event timestamps unchanged (10× arrival rate), order
  * months unchanged (same partition count, 10× partition size).
  */
class ScaleFixturesSpec extends SparkSpec {

  private lazy val out: String = {
    val d = Files.createTempDirectory("graft-scalefx").toString
    ScaleFixtures.generate(spark, sf, d, factor = 3)
    d
  }

  test("row counts scale by the factor; keys are disjoint across replicas") {
    for (t <- Seq("documents", "embeddings", "events", "orders", "lineitem")) {
      val src = spark.read.parquet(s"$sf/$t.parquet").count()
      val gen = spark.read.parquet(s"$out/$t.parquet").count()
      assert(gen == 3 * src, s"$t: $gen != 3*$src")
    }
    val docs = Tables.documents(spark, out)
    assert(docs.select(col("doc_id")).distinct().count() == docs.count())
    val ev = Tables.events(spark, out)
    assert(ev.select(col("event_id")).distinct().count() == ev.count())
  }

  test("document replicas preserve length and whitespace token structure") {
    val src = Tables.documents(spark, sf)
    val gen = Tables.documents(spark, out)
    def lenHist(df: org.apache.spark.sql.DataFrame) =
      df.select(length(col("text")).as("l"),
          size(split(col("text"), " ")).as("w"))
        .groupBy("l", "w").count()
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val s = lenHist(src); val g = lenHist(gen)
    // every (char-length, word-count) bucket exactly triples
    assert(g == s.map { case (k, v) => k -> v * 3 })
    // replicas are DISTINCT text (caesar-shifted), not copies: the exact
    // per-text multiplicity stays what it was in the source
    val srcMax = src.groupBy("text").count().agg(max("count")).head().getLong(0)
    val genMax = gen.groupBy("text").count().agg(max("count")).head().getLong(0)
    assert(genMax == srcMax)
  }

  test("embedding replicas preserve the norm and dimension, decorrelate direction") {
    val src = Tables.embeddings(spark, sf)
    val gen = Tables.embeddings(spark, out)
    def norms(df: org.apache.spark.sql.DataFrame) =
      df.select(round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("n2"))
        .groupBy("n2").count()
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val s = norms(src); val g = norms(gen)
    assert(g == s.map { case (k, v) => k -> v * 3 })
    assert(gen.select(size(col("embedding"))).distinct().count() ==
      src.select(size(col("embedding"))).distinct().count())
  }

  test("event timestamps and order months are unchanged (rate scales, horizon doesn't)") {
    val sTs = Tables.events(spark, sf).agg(min("ts"), max("ts")).head()
    val gTs = Tables.events(spark, out).agg(min("ts"), max("ts")).head()
    assert(sTs == gTs)
    def months(dir: String) = Tables.orders(spark, dir)
      .select(date_trunc("month", col("o_orderdate"))).distinct().count()
    assert(months(out) == months(sf))
  }

  test("generation is deterministic: a second run writes identical tables") {
    val d2 = Files.createTempDirectory("graft-scalefx2").toString
    ScaleFixtures.generate(spark, sf, d2, factor = 3)
    for (t <- Seq("documents", "embeddings")) {
      val a = spark.read.parquet(s"$out/$t.parquet")
      val b = spark.read.parquet(s"$d2/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, t)
    }
  }
}
