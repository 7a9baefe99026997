// Lives under org.apache.spark.sql.* alongside the other graftx catalyst
// extensions. All logic here is graft's own.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view (aggregate projection) rewrite: queries whose
  * CANONICALIZED optimized plan equals a registered fact-table aggregate
  * are silently rerouted to the projection's partial-merge plan
  * (graft.etl.AggProjection.answer) — the fact table is never scanned.
  *
  * Signature-based matching (exact canonical plan equality) is the same
  * contract real MV systems start from; the canonical form normalizes
  * expression ids and file-relation identity, so a semantically identical
  * query built elsewhere in the session matches. The replacement is spliced
  * under a Project that re-aliases its columns to the original plan's
  * exprIds, keeping downstream resolution intact.
  */
object MvRegistry {

  private case class Entry(canonical: LogicalPlan, replacement: LogicalPlan)
  private val entries = scala.collection.mutable.ArrayBuffer[Entry]()

  private def optimized(df: DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  /** Register `naive` (the fact-table aggregate users write) as answerable
    * by `mvAnswer` (the projection scan). Column order and names must line
    * up; correctness of the swap is the caller's contract — hash-proven by
    * the declared query.
    */
  def register(naive: DataFrame, mvAnswer: DataFrame): Unit = synchronized {
    entries += Entry(optimized(naive).canonicalized, optimized(mvAnswer))
  }

  def find(plan: LogicalPlan): Option[LogicalPlan] = synchronized {
    entries.find(_.canonical == plan.canonicalized).map(_.replacement)
  }

  def clear(): Unit = synchronized { entries.clear() }
}

object RewriteAggToProjection extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.mv.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").toBoolean) plan
    else MvRegistry.find(plan) match {
      case Some(repl) if repl.output.length == plan.output.length =>
        val aliased: Seq[NamedExpression] =
          plan.output.zip(repl.output).map { case (orig, n) =>
            Alias(n, orig.name)(exprId = orig.exprId)
          }
        Project(aliased, repl)
      case _ => plan
    }
}
