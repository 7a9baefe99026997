package graft

import org.apache.spark.sql.functions._

import graft.similarity.{IvfStore, KMeansIvf}

class IvfStoreSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cents = KMeansIvf.fit(emb, k = 8, iters = 2)

  test("store probe returns the in-memory IVF result rows exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfstore-t1").toString
    IvfStore.build(emb, tmp, cents)
    val queries = emb.filter(col("vec_id") < 3)
    val store = IvfStore.probe(queries, tmp, k = 4, nprobe = 3)
      .orderBy("query_id", "rk").collect().toSeq
    val mem = KMeansIvf.search(KMeansIvf.index(emb, cents), queries, cents,
        k = 4, nprobe = 3)
      .orderBy("query_id", "rk").collect().toSeq
    assert(store.nonEmpty)
    assert(store === mem)
    // round-tripped quantizer is bit-identical
    assert(IvfStore.centroids(spark, tmp).map(_.toSeq).toSeq ===
      cents.map(_.toSeq).toSeq)
  }

  test("HnswAnn layers are nested and geometrically sparser") {
    import graft.similarity.HnswAnn
    val l0 = HnswAnn.layerCorpus(emb, 0).select("vec_id").collect().map(_.getLong(0)).toSet
    val l1 = HnswAnn.layerCorpus(emb, 1).select("vec_id").collect().map(_.getLong(0)).toSet
    val l2 = HnswAnn.layerCorpus(emb, 2).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(l2.subsetOf(l1) && l1.subsetOf(l0))
    assert(l1.size < l0.size && l2.size < l1.size)
    assert(l1.nonEmpty)
  }

  test("probe prunes to the probed inverted lists at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfstore-t2").toString
    IvfStore.build(emb, tmp, cents)
    val oneQuery = emb.filter(col("vec_id") === 0)
    val probed = IvfStore.probe(oneQuery, tmp, k = 4, nprobe = 2)
    // the isin on the partition column must classify as a PartitionFilter
    // (scan-time directory pruning), not a post-scan data filter
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("vectors"))
      .orElse(plan.linesIterator.find(_.contains("PartitionFilters")))
    assert(scanLine.exists(_.contains("cluster")), plan.take(4000))
    // and the filter actually restricts: 1 query x nprobe=2 of 8 clusters
    val cents2 = IvfStore.centroids(spark, tmp)
    val probedSet = oneQuery
      .select(explode(org.apache.spark.sql.graftx.VectorExprs
        .nearest_centroids(col("embedding"), cents2, 2)).as("c"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(probedSet.size <= 2 && probedSet.nonEmpty)
  }
}
