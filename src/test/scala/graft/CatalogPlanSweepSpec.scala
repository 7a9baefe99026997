package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, IsNull, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}

/** Catalog-wide scale-killer sweep: EVERY declared query's plan is checked
  * for the three anti-patterns that silently stop scaling —
  * CartesianProduct, an unbounded nested-loop join, and a global
  * (unpartitioned) Window — so absence-of-anti-pattern is a structural
  * invariant, not a per-query ad-hoc assertion. A future query that
  * introduces one fails this spec.
  *
  * The nested-loop check is STRUCTURAL, not a name allowlist: a logical
  * join with no equi-key (which Spark must plan as BroadcastNestedLoopJoin
  * or CartesianProduct) passes only when one side's `maxRows` is provably
  * tiny — the scalar-subquery idiom `crossJoin(broadcast(<global agg>))`
  * (maxRows = 1) or a small limited/local relation. `maxRows` is Catalyst's
  * own static row-bound; a data-sized side always reports None and fails.
  * That keeps the invariant self-maintaining: the proof of boundedness
  * lives in the plan, not in a comment next to a query name.
  *
  * Allowlist discipline (global windows only): every entry must name WHY
  * the window input is bounded (driver-bounded list, date spine). If you
  * can't write that sentence, fix the plan instead.
  */
class CatalogPlanSweepSpec extends SparkSpec with PredicateHelper {

  /** Global windows over driver-bounded inputs (SCALE.md "the one global
    * window" + the day-spine family): the window input is a partition/file
    * list or a date spine — thousands of rows at any corpus size.
    */
  private val globalWindowOk: Set[String] = Set(
    "q_partition_discovery", // ranks the PARTITION LIST (bounded by partition count)
    "q_oldest_pending",      // TakeOrdered over the same partition list
    "q_timeseries_interp",   // day spine: ≤ days-in-range rows
    "q_gap_fill",            // forward fill over the day spine (≤ days in range)
    "q_asof_exec",           // slice spine resample: fixed daily grid (bounded)
    "q_hybrid_retrieval",    // rank windows run AFTER limit(100): ≤100 rows
    "q_retrieval_eval"       // same rank windows, inputs bounded by LIMIT 20/100
  )

  /** A nested-loop join side is "provably tiny" when Catalyst can bound its
    * row count statically. 1000 comfortably covers every scalar/stats
    * broadcast in the catalog while staying far below anything data-sized.
    */
  private val tinyMaxRows = 1000L

  /** Loose joins whose broadcast side is bounded by an ALGORITHM CONSTANT
    * that `maxRows` can't see because the side is materialized through a
    * parquet store or a sampled batch: the ANN family broadcasts the query
    * batch (|queries| = probe-batch size, an input constant — brute-force
    * scoring is deliberately |queries|×|corpus| map-side work with zero
    * corpus shuffle) or the centroid/codebook list (nlist / 2^bits rows).
    * Every entry must keep naming its bound; an unlisted loose join fails.
    */
  private val boundedBroadcastOk: Set[String] = Set(
    "q_cosine_topk", // broadcast side = query batch (fixed probe set)
    "q_sq_cosine",   // broadcast side = query batch over SQ-encoded corpus
    "q_knn_graph",   // broadcast side = sampled query chunk (builder constant)
    "q_graph_ann",   // broadcast side = probe batch over the kNN graph
    "q_ann_pq",      // broadcast sides = PQ codebook (2^bits rows) + query batch
    "q_ann_ivf",     // broadcast sides = centroid list (nlist) + query batch
    "q_ann_ivf_pq",  // broadcast sides = centroids + codebook + query batch
    "q_ann_hnsw",    // broadcast side = per-layer beam frontier (beam × degree)
    "q_hybrid_retrieval", // broadcast side = single fixed query embedding
    "q_retrieval_eval",   // same single fixed query embedding
    "q_neardup_eval",     // brute-force truth over the 240-doc EVAL SAMPLE (constant)
    "q_bitext_mining"     // broadcast side = per-language query batch (bounded)
  )

  private def hasEquiKey(j: Join): Boolean = {
    def canEvaluate(e: Expression, plan: LogicalPlan): Boolean =
      e.references.subsetOf(plan.outputSet)
    def twoSided(l: Expression, r: Expression): Boolean =
      (canEvaluate(l, j.left) && canEvaluate(r, j.right)) ||
        (canEvaluate(l, j.right) && canEvaluate(r, j.left))
    j.condition.toSeq.flatMap(splitConjunctivePredicates).exists {
      case EqualTo(l, r)       => twoSided(l, r)
      case EqualNullSafe(l, r) => twoSided(l, r) // INTERSECT/EXCEPT keys
      // NOT IN ⇒ null-aware anti join `a = b OR isnull(a = b)`: Spark plans
      // the single-column form as a broadcast null-aware HASH join
      case Or(EqualTo(l, r), IsNull(EqualTo(l2, r2)))
          if l.semanticEquals(l2) && r.semanticEquals(r2) => twoSided(l, r)
      case _ => false
    }
  }

  /** Loose (no-equi-key) joins where NEITHER side is statically tiny —
    * the joins that plan as an unbounded BNLJ or CartesianProduct.
    */
  private def unboundedLooseJoins(plan: LogicalPlan): Seq[Join] = {
    def walk(p: LogicalPlan): Seq[Join] = {
      val here = p.collect {
        case j: Join if !hasEquiKey(j) &&
          !j.left.maxRows.exists(_ <= tinyMaxRows) &&
          !j.right.maxRows.exists(_ <= tinyMaxRows) => j
      }
      here ++ p.subqueries.flatMap(walk)
    }
    walk(plan)
  }

  private def globalWindows(plan: LogicalPlan): Seq[Window] = {
    val here = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
    val inSubqueries = plan.subqueries.flatMap(globalWindows)
    here ++ inSubqueries
  }

  test("no declared query plans an unbounded loose join or an unlisted global window") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    // benchExcluded = the streaming drains + multi-step ETL mutations:
    // calling fn() EXECUTES their full drain only to return a trivial
    // post-drain parquet read, which cannot contain a loose join or global
    // window — all cost, no assertion. Their operator plans are covered by
    // the streaming specs; the sweep covers every single-plan query.
    (SparkEntry.queries -- QueryCatalog.benchExcluded)
      .toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df: DataFrame =
        try fn(spark, sf)
        catch { case e: Throwable =>
          failures += s"$name: query construction failed: ${e.getMessage}"
          null
        }
      if (df != null) {
        val optimized = df.queryExecution.optimizedPlan
        if (!boundedBroadcastOk(name))
          unboundedLooseJoins(optimized).foreach { j =>
            failures += s"$name: loose join with no statically-bounded side " +
              s"(${j.joinType}, maxRows l=${j.left.maxRows} r=${j.right.maxRows})"
          }
        if (globalWindows(optimized).nonEmpty && !globalWindowOk(name))
          failures += s"$name: global (unpartitioned) Window in plan"
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
