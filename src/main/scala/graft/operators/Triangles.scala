package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-based edge orientation.
  *
  * The naive wedge join (all 2-paths through every node) is quadratic in the
  * degree of hub nodes — one celebrity vertex with degree d contributes
  * d²/2 wedges and melts its shuffle partition. Orienting every edge from
  * its lower-(degree, id) endpoint to the higher one bounds every node's
  * OUT-degree by O(√m), so the wedge count is O(m^1.5) worst case and hub
  * skew disappears — the standard MapReduce formulation (Suri & Vassilvitskii,
  * WWW'11). All three steps are hash-partitioned equality joins; nothing is
  * collected to the driver.
  *
  * The reference has no graph surface (its 492 LoC generate extract SQL);
  * pair→group reasoning over dedup graphs ([[ConnectedComponents]]) and
  * co-occurrence analysis both need closed-triangle statistics at corpus
  * scale.
  */
object Triangles {

  /** Count triangles in an undirected graph given as (a, b) pairs (any
    * direction, duplicates allowed). Returns one row:
    * `(n_edges, n_wedges, n_triangles)` — edges after canonicalization,
    * wedges generated under the degree orientation, closed triangles.
    */
  def countTriangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonical undirected edge set: (lo, hi), no self-loops, distinct
    val canon = pairs.select(
        least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()

    val deg = canon.select(col("lo").as("v"))
      .unionAll(canon.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // orient lower-(d, v) → higher-(d, v); carry both degrees so the wedge
    // self-join can compare (d, v) without re-joining the degree table
    val withDeg = canon
      .join(deg.withColumnRenamed("v", "lo").withColumnRenamed("d", "d_lo"), "lo")
      .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("d", "d_hi"), "hi")
    val loFirst = col("d_lo") < col("d_hi") ||
      (col("d_lo") === col("d_hi") && col("lo") < col("hi"))
    // NOT checkpointed: the oriented edge set feeds both wedge sides and
    // the closing probe, but the three references share identical exchanges
    // that Spark's ReuseExchange dedups — measured faster than a
    // localCheckpoint materialization (2.7 s vs 3.3 s at sf0.1)
    val oriented = withDeg.select(
      when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
      when(loFirst, col("hi")).otherwise(col("lo")).as("dst"),
      when(loFirst, col("d_hi")).otherwise(col("d_lo")).as("d_dst"))

    // wedges at src: ordered out-neighbor pairs under the same (d, v) order
    val e1 = oriented.select(col("src"), col("dst").as("b"), col("d_dst").as("db"))
    val e2 = oriented.select(col("src"), col("dst").as("c"), col("d_dst").as("dc"))
    val wedges = e1.join(e2, "src")
      .filter(col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c")))
      .select(col("b"), col("c"))

    // a wedge (b, c) closes iff the oriented edge b→c exists (orientation
    // order is total, so the closing edge can only be oriented b→c).
    // Oriented edges are unique, so the left join cannot multiply wedge
    // rows — wedge and triangle counts fall out of ONE aggregate.
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
      .withColumn("hit", lit(1))
    val wt = wedges.join(closing, Seq("b", "c"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("hit")).as("n_triangles"))
    canon.agg(count(lit(1)).as("n_edges")).crossJoin(wt)
  }
}
