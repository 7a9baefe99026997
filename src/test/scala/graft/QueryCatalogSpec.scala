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

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
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
