package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1.0") {
    val emb = Tables.embeddings(spark, sf).limit(10)
    val cos = emb.select(VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k: k rows per query, ranked by descending cosine") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val rows = out.collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall {
        case Array(x, y) => x >= y
        case _ => true
      })
    }
  }

  test("LSH top-k results are true neighbors (subset check vs brute force)") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, q, k = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // every LSH hit is a real vector pair from the same bucket; sanity: per
    // query ≤ k results and no self-pairs
    assert(lsh.groupBy(_._1).forall(_._2.length <= 5))
    assert(lsh.forall { case (a, b) => a != b })
    assert(brute.nonEmpty)
  }

  test("native cosine/lshBucket are bit-identical to the HOF formulations") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ia") < 10)
    val diff = pairs.select(
      VectorFunctions.cosine(col("ea"), col("eb")).as("native"),
      VectorFunctions.cosineHof(col("ea"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    val bdiff = emb.select(
      VectorFunctions.lshBucket(col("embedding")).as("n"),
      VectorFunctions.lshBucketHof(col("embedding")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bdiff == 0)
  }

  test("opt-in optimizer rule rewrites naive cosine cross join to LSH equi-join") {
    import org.apache.spark.sql.graftx.RewriteCosineSelfJoin
    val emb = Tables.embeddings(spark, sf)
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    def naive = a.crossJoin(b)
      .filter(VectorFunctions.cosine(col("emb_a"), col("emb_b")) >= 0.2 &&
        col("vec_a") < col("vec_b"))
    val exact = naive.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

    spark.experimental.extraOptimizations ++= Seq(RewriteCosineSelfJoin)
    spark.conf.set("spark.graft.similarity.rewrite", "true")
    try {
      val plan = naive.queryExecution.optimizedPlan.toString
      assert(plan.contains("lsh_bucket"), s"rewrite did not fire:\n$plan")
      val rewritten = naive.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(rewritten.subsetOf(exact)) // approximation: only drops pairs
      assert(rewritten.nonEmpty)
      // and it agrees with the hand-written blocked operator
      val manual = Similarity.cosineNearDups(emb, 0.2)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(rewritten == manual)
    } finally {
      spark.conf.set("spark.graft.similarity.rewrite", "false")
    }
  }

  test("k-means IVF: deterministic fit, correct probing, useful recall") {
    import graft.similarity.KMeansIvf
    val emb = Tables.embeddings(spark, sf)
    val cent1 = KMeansIvf.fit(emb, k = 16, iters = 3)
    val cent2 = KMeansIvf.fit(emb, k = 16, iters = 3)
    assert(cent1.length == 16)
    assert(cent1.map(_.toSeq).toSeq == cent2.map(_.toSeq).toSeq) // deterministic
    val indexed = KMeansIvf.index(emb, cent1)
    assert(indexed.select("cluster").distinct().count() <= 16)
    val q = emb.filter(col("vec_id") < 10)
    val got = KMeansIvf.search(indexed, q, cent1, k = 10, nprobe = 4)
    val brute = Similarity.bruteForceTopK(emb, q, k = 10)
    val gotSet = got.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bruteSet = brute.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.groupBy("query_id").count().collect().forall(_.getLong(1) <= 10))
    val recall = (gotSet intersect bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.2, s"recall=$recall") // 4/16 clusters probed on random data
  }

  test("k-means IVF fit: hash-sampled working set still yields k usable centroids") {
    import graft.similarity.KMeansIvf
    val emb = Tables.embeddings(spark, sf)
    // force the sampling branch with a cap far below the corpus size
    val cent = KMeansIvf.fit(emb, k = 8, iters = 2, maxFitRows = 100)
    val cent2 = KMeansIvf.fit(emb, k = 8, iters = 2, maxFitRows = 100)
    assert(cent.length == 8)
    assert(cent.map(_.toSeq).toSeq == cent2.map(_.toSeq).toSeq) // layout-independent sample
    val indexed = KMeansIvf.index(emb, cent)
    assert(indexed.select("cluster").distinct().count() <= 8)
  }

  test("k-means IVF search: shuffled-join fallback equals the broadcast path") {
    import graft.similarity.KMeansIvf
    val emb = Tables.embeddings(spark, sf)
    val cent = KMeansIvf.fit(emb, k = 16, iters = 2)
    val indexed = KMeansIvf.index(emb, cent)
    val q = emb.filter(col("vec_id") < 5)
    def rows(maxBroadcast: Long) =
      KMeansIvf.search(indexed, q, cent, k = 5, nprobe = 4, maxBroadcast)
        .select("query_id", "neighbor_id", "rk")
        .as[(Long, Long, Long)].collect().toSet
    val broadcasted = rows(Long.MaxValue)
    val shuffled = rows(0L) // forces the non-broadcast branch
    assert(broadcasted == shuffled && broadcasted.nonEmpty)
  }

  test("product quantizer: valid codes, deterministic encode, ADC recall") {
    import graft.similarity.ProductQuantizer
    val emb = Tables.embeddings(spark, sf)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val model = ProductQuantizer.fit(emb, dim, m = 8, k = 16, iters = 2)
    assert(model.m == 8 && model.subDim == dim / 8)
    val enc = ProductQuantizer.encode(emb, model)
    val codes = enc.select(col("codes")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // deterministic encode
    val codes2 = ProductQuantizer.encode(emb, model)
      .select(col("codes")).as[Seq[Int]].collect()
    assert(codes.map(_.toList).toSeq == codes2.map(_.toList).toSeq)
    val q = emb.filter(col("vec_id") < 10)
    val got = ProductQuantizer.searchADC(enc, q, emb, model, k = 10)
    val brute = Similarity.bruteForceTopK(emb, q, k = 10)
    val gotSet = got.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bruteSet = brute.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (gotSet intersect bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"ADC+rerank recall=$recall")
  }

  test("IVF-PQ: cluster pruning shrinks the ADC candidate set, recall holds") {
    import graft.similarity.{KMeansIvf, ProductQuantizer}
    val emb = Tables.embeddings(spark, sf)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cent = KMeansIvf.fit(emb, k = 16, iters = 2)
    val model = ProductQuantizer.fit(emb, dim, m = 8, k = 16, iters = 2)
    val encIdx = ProductQuantizer.encode(emb, model)
      .join(KMeansIvf.index(emb, cent).select("vec_id", "cluster"), "vec_id")
    val q = emb.filter(col("vec_id") < 10)
    val ivfpq = ProductQuantizer.searchIvfPq(encIdx, q, emb, cent, model,
      k = 10, nprobe = 8)
    val full = ProductQuantizer.searchADC(encIdx.drop("cluster"), q, emb, model, k = 10)
    val got = ivfpq.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val fullSet = full.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && fullSet.nonEmpty)
    val brute = Similarity.bruteForceTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got intersect brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF-PQ recall=$recall") // 8/16 lists probed
  }

  test("int8 scalar quantization: codes in range, high top-k recall vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val codes = emb.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= -127 && c <= 127)))
    assert(codes.forall(_.exists(c => math.abs(c) == 127))) // max element hits scale
    val q = emb.filter(col("vec_id") < 10)
    val sq = Similarity.sqTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (sq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ recall=$recall") // int8 barely perturbs ranking
  }

  test("lsh bucket is deterministic and within range") {
    val emb = Tables.embeddings(spark, sf)
    val b1 = emb.select(VectorFunctions.lshBucket(col("embedding")).as("b")).as[Long].collect()
    val b2 = emb.select(VectorFunctions.lshBucket(col("embedding")).as("b")).as[Long].collect()
    assert(b1.sameElements(b2))
    assert(b1.forall(b => b >= 0 && b < (1 << VectorFunctions.LshBits)))
  }

  test("kNN graph: every vector gets <= k ranked neighbors; recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val graph = graft.similarity.KnnGraph.build(emb, k = 10, rounds = 4)
    val n = emb.count()
    val perSrc = graph.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(perSrc <= 10)
    assert(graph.select("src").distinct().count() == n)
    val q = emb.filter(col("vec_id") < 25)
    val brute = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graph.filter(col("src") < 25)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(s"knn-graph recall@5 = $recall")
    assert(recall >= 0.5, s"recall $recall below floor")
  }

  test("random projection: deterministic, norms preserved per Johnson-Lindenstrauss") {
    val emb = Tables.embeddings(spark, sf)
    val proj = emb.select(col("vec_id"),
      VectorFunctions.randomProjection(col("embedding"), 16)
        .cast("array<float>").as("embedding"))
    val q = emb.filter(col("vec_id") < 25)
    val qp = proj.filter(col("vec_id") < 25)
    // The JL guarantee is about NORMS/DISTANCES, not fine-grained rankings
    // (random 64-dim vectors have near-zero pairwise cosines, so top-k is
    // not preservable at 16 dims): E[||Pv||²] = outDim·Var(w)·||v||²
    // = 16·4·||v||², and per-vector ratios concentrate around 1.
    val ratios = emb.join(proj.withColumnRenamed("embedding", "pemb"), "vec_id")
      .select((VectorFunctions.dot(col("pemb"), col("pemb")) /
        (lit(64.0) * VectorFunctions.dot(col("embedding"), col("embedding"))))
        .as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    info(f"norm-ratio mean=$mean%.3f min=${ratios.min}%.3f max=${ratios.max}%.3f")
    assert(mean > 0.8 && mean < 1.25, s"norm-preservation mean off: $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.5).toDouble / ratios.length >= 0.9,
      "norm ratios not concentrated")
    // deterministic across evaluations
    val a = qp.orderBy("vec_id").collect().map(_.toString)
    val b = emb.filter(col("vec_id") < 25).select(col("vec_id"),
        VectorFunctions.randomProjection(col("embedding"), 16)
          .cast("array<float>").as("embedding"))
      .orderBy("vec_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("PCA: Jacobi recovers known spectrum; integer Gram exact, symmetric, PSD") {
    import graft.similarity.Pca
    // A has eigenvalues 5, 3, 1 (2x2 block [[2,1],[1,2]] -> 3,1; plus 5)
    val a = Array(Array(2.0, 1.0, 0.0), Array(1.0, 2.0, 0.0), Array(0.0, 0.0, 5.0))
    val (ev, vec) = Pca.jacobiEigen(a)
    assert(ev.zip(Seq(5.0, 3.0, 1.0)).forall { case (x, y) => math.abs(x - y) < 1e-9 }, ev.toSeq)
    for (i <- 0 until 3) {
      val v = vec(i)
      val av = (0 until 3).map(r => (0 until 3).map(c => a(r)(c) * v(c)).sum)
      assert((0 until 3).forall(r => math.abs(av(r) - ev(i) * v(r)) < 1e-9),
        s"A v != lambda v for component $i")
    }
    val emb = Tables.embeddings(spark, sf)
    val (g, n) = Pca.int8Gram(emb)
    assert(n == emb.count())
    assert(g.indices.forall(i => g.indices.forall(j => g(i)(j) == g(j)(i))), "Gram symmetric")
    // partitioning must not change the exact integer Gram
    val (g2, n2) = Pca.int8Gram(emb.repartition(7))
    assert(n2 == n && g.indices.forall(i => g(i).sameElements(g2(i))),
      "Gram must be partitioning-independent")
    val (ge, _) = Pca.jacobiEigen(g.map(_.map(_.toDouble / n)))
    assert(ge.last > -1e-6, s"Gram must be PSD, got min eig ${ge.last}")
  }

  test("graph ANN beam search: k ranked rows per query, deterministic, recall floor") {
    val emb = Tables.embeddings(spark, sf)
    val graph = graft.similarity.KnnGraph.build(emb, k = 10, rounds = 4)
    val q = emb.filter(col("vec_id") < 25)
    def run() = graft.similarity.GraphAnn.search(graph, emb, q, k = 5, beam = 12, hops = 3)
    val res = run()
    // exactly k ranked neighbors per query, rk dense from 1
    val byQuery = res.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
    assert(byQuery.filter(col("n") =!= 5 || col("mx") =!= 5 || col("mn") =!= 1).count() == 0)
    assert(res.select("query_id").distinct().count() == q.count())
    // a corpus-member query must find itself (cos = 1 beats everything)
    assert(res.filter(col("rk") === 1 && col("query_id") =!= col("neighbor_id")).count() == 0)
    val brute = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = res.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    info(s"graph-ann recall@5 = $recall")
    assert(recall >= 0.5, s"recall $recall below floor")
    assert(run().collect().map(_.toString).sorted
      .sameElements(res.collect().map(_.toString).sorted), "search must be deterministic")
  }

  test("semantic dedup: one representative per duplicate cluster, singletons kept") {
    // three exact copies of vec 1, two of vec 10, plus untouched originals
    val emb = Tables.embeddings(spark, sf)
    val dup1 = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val dup2 = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 2000).as("vec_id"), col("embedding"), col("label"))
    val dup3 = emb.filter(col("vec_id") === 10)
      .select((col("vec_id") + 3000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(dup1).unionByName(dup2).unionByName(dup3)
    val out = graft.dedup.SemanticDedup.survivors(corpus, threshold = 0.999999)
    val ids = out.select("vec_id").as[Long].collect().toSet
    // copies of identical vectors share an LSH bucket and cos=1 → clustered;
    // min-id representative survives
    assert(ids.contains(1L) && !ids.contains(1001L) && !ids.contains(2001L))
    assert(ids.contains(10L) && !ids.contains(3010L))
    // everything else untouched
    val nOrig = emb.count()
    assert(out.count() == nOrig)
  }
}
