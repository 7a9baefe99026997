package graft

import org.apache.spark.sql.functions._

import graft.etl.Scd2
import graft.functions.{Bm25, TopKAgg}
import graft.operators.Triangles

/** BM25 retrieval, triangle counting, SCD2 build, top-k aggregator. */
class RetrievalGraphSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BM25

  private def corpus = Seq(
    (1L, "spark joins data with spark"),
    (2L, "joins are slow"),
    (3L, "vector search beats scan search"),
    (4L, "nothing relevant here at all")
  ).toDF("doc_id", "text")

  test("bm25: only docs containing a query term are scored") {
    val r = Bm25.score(Bm25.buildIndex(corpus), Bm25.docLengths(corpus),
      Seq("spark", "joins")).collect()
    assert(r.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("bm25: higher tf of a rarer term scores higher") {
    val r = Bm25.score(Bm25.buildIndex(corpus), Bm25.docLengths(corpus),
        Seq("spark"))
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    // doc 1 has tf=2 for 'spark', and it is the only match
    assert(r.keySet == Set(1L) && r(1L) > 0)
  }

  test("bm25: score is partitioning-independent (exact long micros)") {
    val docs = Tables.documents(spark, sf)
    val a = Bm25.score(Bm25.buildIndex(docs), Bm25.docLengths(docs),
      Seq("join", "vector")).orderBy("doc_id").collect().toSeq
    val docs8 = docs.repartition(8)
    val b = Bm25.score(Bm25.buildIndex(docs8), Bm25.docLengths(docs8),
      Seq("join", "vector")).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ----------------------------------------------------------- triangles

  private def tri(edges: (Long, Long)*) =
    Triangles.countTriangles(edges.toSeq.toDF("a", "b"), "a", "b")
      .select("n_triangles").as[Long].head()

  test("triangles: K4 has 4, a path has 0, duplicates/direction ignored") {
    assert(tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) == 4L)
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)) == 0L)
    // same K3 given twice, reversed, with a self-loop
    assert(tri((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L)) == 1L)
  }

  test("triangles: wedge count bounded by oriented out-degrees") {
    // star graph: center 0 connects to 1..6; orientation sends all edges
    // INTO the center (leaves have degree 1), so no wedges at all
    val star = (1L to 6L).map(i => (0L, i)).toDF("a", "b")
    val r = Triangles.countTriangles(star, "a", "b").head()
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 0L)
    assert(r.getAs[Long]("n_triangles") == 0L)
  }

  // ---------------------------------------------------------------- scd2

  test("scd2: collapses runs, builds adjacent intervals, flags current") {
    val log = Seq(
      (1L, 10L, 100L, "bronze"), (1L, 20L, 101L, "bronze"),
      (1L, 30L, 102L, "gold"), (1L, 40L, 103L, "bronze"),
      (2L, 15L, 104L, "silver")
    ).toDF("user_id", "ts", "seq", "tier")
    val r = Scd2.build(log, Seq("user_id"), "tier", "ts", Seq("seq"))
      .orderBy("user_id", "version").collect()
    val u1 = r.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("bronze", "gold", "bronze"))
    assert(u1.map(_.getLong(3)).toSeq == Seq(10L, 30L, 40L)) // valid_from
    assert(u1.map(x => Option(x.get(4))).toSeq ==
      Seq(Some(30L), Some(40L), None)) // valid_to chains
    assert(u1.map(_.getBoolean(5)).toSeq == Seq(false, false, true))
    assert(r.count(_.getLong(0) == 2L) == 1)
  }

  test("scd2: same-ts changes are ordered by the tie-break") {
    val log = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")).toDF("u", "ts", "seq", "v")
    val r = Scd2.build(log, Seq("u"), "v", "ts", Seq("seq"))
      .orderBy("version").select("v").as[String].collect().toSeq
    assert(r == Seq("a", "b"))
  }

  // ------------------------------------------------------------- top-k

  test("topk aggregator ≡ window row_number, any partitioning") {
    val orders = Tables.orders(spark, sf).repartition(7)
    val tk = udaf(new TopKAgg(3))
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(tk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rk"),
        col("col.id").as("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topk aggregator: buffer stays bounded at k") {
    val agg = new TopKAgg(2)
    val buf = (1 to 100).foldLeft(agg.zero) { (b, i) =>
      agg.reduce(b, graft.functions.ScoredId(i.toDouble, i.toLong))
    }
    assert(buf.size == 2 && buf.map(_.id) == Seq(100L, 99L))
    val merged = agg.merge(buf, agg.reduce(agg.zero, graft.functions.ScoredId(1000.0, 7L)))
    assert(merged.size == 2 && merged.head.id == 7L)
  }
}
