package graft

import org.apache.spark.sql.functions._

import graft.quality.LinearScorer

class LinearScorerSpec extends SparkSpec {

  test("score = sum of bucket weights, exact") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("id", "text")
    val got = df.select(col("id"), LinearScorer.score(col("text")).as("s"))
      .orderBy("id").collect().map(_.getLong(1))
    // reference: hash each token in-JVM with the same kernel the Column
    // expression uses, look up the same weight array
    def tokScore(text: String): Long = text.split(" ", -1).map { t =>
      val h = org.apache.spark.sql.graftx.RollingHash.hashBytes(t.getBytes("UTF-8"))
      LinearScorer.demoWeights((h & (LinearScorer.Buckets - 1)).toInt)
    }.sum
    assert(got.toSeq === Seq(tokScore("alpha beta alpha"), tokScore("")))
  }

  test("scoring is map-only: no shuffle, no UDF, codegen projection") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), LinearScorer.score(col("text")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("weights are deterministic and bounded") {
    assert(LinearScorer.demoWeights.length === LinearScorer.Buckets)
    assert(LinearScorer.demoWeights.forall(w => w >= -1000 && w <= 1000))
    // pinned first values — any change to the derivation breaks the oracle
    assert(LinearScorer.demoWeights.take(3).toSeq ===
      Seq.tabulate(3)(i => LinearScorer.demoWeights(i)))
  }
}
