package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the clustering step a
  * dedup pipeline needs to turn near-duplicate PAIRS into duplicate GROUPS
  * (pick one representative per component, drop the rest).
  *
  * Spark has no built-in CC; this implements it adaptively:
  *
  *  - **Small edge lists** (≤ [[MaxLocalEdges]], i.e. ≲32 MB of (long,long)
  *    pairs — the common case for near-dup graphs, whose edge count is a tiny
  *    fraction of the corpus): solved exactly in ONE task by union–find with
  *    path compression. Any distributed loop pays multiple shuffle rounds of
  *    pure fixed overhead for a graph this size.
  *  - **Large edge lists**: iterative min-label propagation with pointer
  *    jumping (label := label(label) each round, as in PRAM/MapReduce CC
  *    literature), O(log diameter) rounds. The loop runs on co-partitioned
  *    pair RDDs — the GraphX execution model — rather than DataFrames: an
  *    iterative algorithm would re-plan, re-optimize and re-compile (Janino)
  *    a fresh DataFrame DAG every round, and that fixed cost dominates; the
  *    RDD loop reuses one `HashPartitioner`, so the persisted side of each
  *    join never re-shuffles and nothing is recompiled. Each round is ONE
  *    action (the convergence count) over two shuffles of (long, long)
  *    pairs — no collect, no driver-side graph, so it holds at 100 TB edge
  *    lists. `localCheckpoint` truncates lineage each round.
  *
  * Both paths produce identical labels (component = min member id), asserted
  * against each other in OperatorsSpec.
  */
object ConnectedComponents {

  /** Edge count at or below which the graph is solved in a single task
    * (~32 MB of long pairs). Also the target per-partition edge volume for
    * the distributed loop's partitioner, so partition count scales with the
    * edge list: thousands of reducers at 100 TB, few tasks on small graphs.
    */
  val MaxLocalEdges: Long = 2L << 20

  /** @param edges undirected edge list; self-loops and duplicates tolerated
    * @param src   source-node column name (castable to long)
    * @param dst   destination-node column name (castable to long)
    * @param maxLocalEdges override of [[MaxLocalEdges]] (tests set 0 to force
    *                      the distributed loop)
    * @return (id, component) — one row per distinct node, component = min
    *         node id reachable from it
    */
  def apply(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 30, maxLocalEdges: Long = MaxLocalEdges): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the (possibly expensive) edge query through the codegen'd
    // DataFrame path FIRST; converting an unmaterialized Dataset to an RDD
    // would re-run its whole pipeline in interpreted (non-WSCG) mode
    val edgesCk = edges.select(col(src).cast("long"), col(dst).cast("long"))
      .localCheckpoint()
    val nEdges = edgesCk.count()
    val raw = edgesCk.as[(Long, Long)].rdd
    if (nEdges <= maxLocalEdges)
      raw.coalesce(1).mapPartitions(localCC).toDF("id", "component")
    else
      distributedCC(raw, nEdges, maxIter).toDF("id", "component")
  }

  /** Incrementally merge a wave of NEW edges into existing component labels
    * — the maintenance path a dedup pipeline needs at scale: near-dup pairs
    * arrive with every ingest wave, and re-running CC over the full
    * accumulated pair graph makes wave cost grow with HISTORY (the same
    * defect the ETL tier's manifest pruning closed for month copies).
    *
    * The trick is the standard contracted-graph argument: existing labels
    * are a certified partition, so each previous component can be COLLAPSED
    * to one node (its label, which by the min-member invariant is a real
    * node id). Map both endpoints of every new edge through the previous
    * labels (unseen nodes map to themselves), run CC on the collapsed edge
    * list — whose size is the wave's edges, never history — then relabel:
    * previous components that the collapsed run merged take their new
    * label, untouched components keep theirs, and wave-only nodes come out
    * of the collapsed run directly. Labels stay min-member ids: a collapsed
    * group's min over {component mins ∪ new node ids} IS the merged
    * component's min member. `OperatorsSpec` proves merge ≡ from-scratch on
    * adversarial waves (bridges, intra-component edges, new node with an
    * id below the old min); `q_cc_incremental` hash-checks the equivalence
    * against the recursive-CTE closure over the UNION of the waves.
    *
    * Shuffle shape at 100 TB: two equality joins of the wave against the
    * label store (shuffles sized by the wave), one CC on the collapsed
    * graph (wave-sized), one label-keyed join to relabel history — the
    * only history-sized shuffle, and it is a straight (long, long)
    * equality join, embarrassingly partitionable. No step scans the
    * historical EDGE list at all; it is never stored.
    *
    * @param prevLabels (id, component) from a prior [[apply]]/[[merge]]
    * @param newEdges   this wave's undirected edges
    * @return (id, component) over the union of both node sets
    */
  def merge(prevLabels: DataFrame, newEdges: DataFrame,
      src: String = "src", dst: String = "dst", maxIter: Int = 30,
      maxLocalEdges: Long = MaxLocalEdges): DataFrame = {
    val prev = prevLabels
      .select(col("id").cast("long"), col("component").cast("long"))
      .localCheckpoint() // labels are read 3x below; don't re-run upstream
    val e = newEdges.select(col(src).cast("long").as("ea"),
      col(dst).cast("long").as("eb"))
    // collapse endpoints to their previous component (self if unseen)
    val la = prev.select(col("id").as("ea"), col("component").as("ca"))
    val lb = prev.select(col("id").as("eb"), col("component").as("cb"))
    val collapsed = e.join(la, Seq("ea"), "left").join(lb, Seq("eb"), "left")
      .select(coalesce(col("ca"), col("ea")).as("u"),
        coalesce(col("cb"), col("eb")).as("v"))
    // CC on the wave-sized collapsed graph; its node ids are previous
    // component ids and wave-only node ids (disjoint sets: a component id
    // is a member of the previous graph, a wave-only id is not)
    val relabel = apply(collapsed, "u", "v", maxIter, maxLocalEdges)
      .localCheckpoint() // read 2x; the CC loop must not run twice
    val prevComponents = prev.select(col("component").as("u")).distinct()
    // previous nodes: follow their component through the collapsed run if
    // it participated, else keep the old label
    val rl = relabel.select(col("id").as("component"), col("component").as("newc"))
    val relabeledPrev = prev.join(rl, Seq("component"), "left")
      .select(col("id"), coalesce(col("newc"), col("component")).as("component"))
    // wave-only nodes: collapsed rows whose id is not a previous component
    val waveOnly = relabel.join(prevComponents,
      relabel("id") === prevComponents("u"), "left_anti")
      .select(col("id"), col("component"))
    relabeledPrev.unionByName(waveOnly)
  }

  /** Single-task exact CC: union–find with path compression, union-by-min so
    * every root IS its component's min id. Bounded by [[MaxLocalEdges]].
    */
  private def localCC(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      if (a != b) {
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    parent.keys.toArray.iterator.map(x => (x, find(x)))
  }

  private def distributedCC(raw: org.apache.spark.rdd.RDD[(Long, Long)],
      nEdges: Long, maxIter: Int): org.apache.spark.rdd.RDD[(Long, Long)] = {
    val sc = raw.sparkContext
    val numParts = math.max(1L, math.min(
      math.max(raw.getNumPartitions, sc.defaultParallelism).toLong,
      2L * nEdges / MaxLocalEdges + 1L)).toInt
    val part = new HashPartitioner(numParts)
    val min2 = (a: Long, b: Long) => math.min(a, b)

    // symmetric + deduped, keyed by the node whose label the join reads:
    // entry (x, n) = "n is a neighbor of x"
    val nbrs = raw
      .flatMap { case (a, b) =>
        if (a == b) Iterator.empty else Iterator((a, b), (b, a))
      }
      .distinct(numParts)
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed: label = min(self, direct neighbors) — this IS the first
    // propagation step, one aggregation instead of node-list + join
    var labels = nbrs
      .reduceByKey(part, min2)
      .mapPartitions(_.map { case (x, mn) => (x, math.min(x, mn)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    var previous: org.apache.spark.rdd.RDD[_] = labels
    while (!converged && iter < maxIter) {
      // neighbor-min: nbrs is keyed by the label OWNER and co-partitioned
      // with labels → zero-shuffle join; only the re-key to the neighbor
      // shuffles (long, long) pairs
      val nbrMin = nbrs.join(labels)
        .map { case (_, (n, lx)) => (n, lx) }
        .reduceByKey(part, min2)
      val stepped = labels.leftOuterJoin(nbrMin) // co-partitioned, no shuffle
        .mapPartitions(_.map { case (id, (old, mn)) =>
          (id, (old, math.min(old, mn.getOrElse(old))))
        }, preservesPartitioning = true)
      // pointer jump: labels always point at node ids, so label(label)
      // exists; plain is `stepped` re-viewed as (id, label), co-partitioned
      val plain = stepped.mapPartitions(
        _.map { case (id, (_, lbl)) => (id, lbl) }, preservesPartitioning = true)
      val jumped = stepped
        .map { case (id, (old, lbl)) => (lbl, (id, old)) }
        .join(plain, part)
        .map { case (lbl, ((id, old), plbl)) => (id, (old, math.min(lbl, plbl))) }
        .partitionBy(part)
      jumped.localCheckpoint()
      // the convergence count is the one action per round; it also
      // materializes the checkpoint
      val changed = jumped.filter { case (_, (old, nw)) => old != nw }.count()
      labels = jumped.mapPartitions(
        _.map { case (id, (_, nw)) => (id, nw) }, preservesPartitioning = true)
      previous.unpersist(blocking = false)
      previous = jumped
      converged = changed == 0L
      iter += 1
    }
    nbrs.unpersist(blocking = false)
    labels
  }
}
