package graft

import graft.operators.LabelPropagation

/** Synchronous LPA determinism and community structure. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two triangles joined by one bridge edge: {1,2,3} and {10,11,12}
  private val twoCommunities = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L), (11L, 12L), (10L, 12L),
    (3L, 10L)
  ).toDF("a", "b")

  test("lpa: two dense communities get two distinct labels") {
    val r = LabelPropagation.run(twoCommunities, "a", "b", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Set(r(1L), r(2L)) == Set(r(1L)) && r(1L) == r(2L) && r(2L) == r(3L))
    assert(r(10L) == r(11L) && r(11L) == r(12L))
    assert(r(1L) != r(10L))
  }

  test("lpa: result is partitioning-independent") {
    val a = LabelPropagation.run(twoCommunities, "a", "b", 3)
      .orderBy("node").collect().toSeq
    val b = LabelPropagation.run(twoCommunities.repartition(5), "a", "b", 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("lpa: duplicate and reversed edges do not change the labeling") {
    val noisy = twoCommunities
      .unionAll(twoCommunities.select($"b".as("a"), $"a".as("b")))
    val a = LabelPropagation.run(twoCommunities, "a", "b", 2)
      .orderBy("node").collect().toSeq
    val b = LabelPropagation.run(noisy, "a", "b", 2)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
