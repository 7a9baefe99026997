package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Catalog-wide scale-killer sweep: EVERY declared query's plan is checked
  * for the three anti-patterns that silently stop scaling —
  * CartesianProduct, BroadcastNestedLoopJoin, and a global (unpartitioned)
  * Window — so absence-of-anti-pattern is a structural invariant, not a
  * per-query ad-hoc assertion. A future query that introduces one fails
  * this spec unless it lands on the explicit, documented allowlist below.
  *
  * Allowlist discipline: every entry must name WHY the pattern is bounded
  * (driver-bounded list, one-row scalar broadcast). If you can't write that
  * sentence, fix the plan instead.
  */
class CatalogPlanSweepSpec extends SparkSpec {

  /** Global windows over driver-bounded inputs (SCALE.md "the one global
    * window" + the day-spine family): the window input is a partition/file
    * list or a date spine — thousands of rows at any corpus size.
    */
  private val globalWindowOk: Set[String] = Set(
    "q_partition_discovery", // ranks the PARTITION LIST (bounded by partition count)
    "q_timeseries_interp",   // day spine: ≤ days-in-range rows
    "q_asof_exec"            // slice spine resample: fixed daily grid (bounded)
  )

  /** BroadcastNestedLoopJoin is acceptable ONLY as the scalar-subquery
    * idiom: `crossJoin(broadcast(<1-to-4-row aggregate>))`. The broadcast
    * side is a global aggregate output, not data-sized.
    */
  private val scalarBnljOk: Set[String] = Set.empty // filled by evidence; keep tight

  /** CartesianProduct is never acceptable. */
  private val cartesianOk: Set[String] = Set.empty

  private def globalWindows(plan: LogicalPlan): Seq[Window] = {
    val here = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
    val inSubqueries = plan.subqueries.flatMap(globalWindows)
    here ++ inSubqueries
  }

  test("no declared query plans a cartesian product, an unlisted nested-loop join, or an unlisted global window") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df: DataFrame =
        try fn(spark, sf)
        catch { case e: Throwable =>
          failures += s"$name: query construction failed: ${e.getMessage}"
          null
        }
      if (df != null) {
        val physical = df.queryExecution.executedPlan.toString
        if (physical.contains("CartesianProduct") && !cartesianOk(name))
          failures += s"$name: CartesianProduct in plan"
        if (physical.contains("BroadcastNestedLoopJoin") && !scalarBnljOk(name))
          failures += s"$name: BroadcastNestedLoopJoin in plan"
        if (globalWindows(df.queryExecution.optimizedPlan).nonEmpty &&
            !globalWindowOk(name))
          failures += s"$name: global (unpartitioned) Window in plan"
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
