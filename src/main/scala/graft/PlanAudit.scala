package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape audits shared by ScalePropertiesSpec and the DbgWindows
  * census main.
  *
  * The one subtlety this encapsulates: `optimizedPlan` is computed
  * AFTER cache substitution, so any subtree an entry `persistTracked`s
  * appears as an `InMemoryRelation` LEAF — a logical collect alone is
  * blind to whatever hides inside it. The audit therefore also walks
  * each cached relation's PHYSICAL build plan (unwrapping adaptive
  * wrappers and nested cached scans) so a single-partition window
  * cannot dodge the catalog-wide ban by sitting under a persist.
  */
object PlanAudit {

  /** Every window with an EMPTY partitionSpec reachable from `df` —
    * logical nodes plus those inside cached subtrees. Each executes as
    * a single-task global sort ("No Partition Defined for Window
    * operation"), the p94-class scale killer.
    */
  def unpartitionedWindows(df: DataFrame): Seq[String] = {
    val lp = df.queryExecution.optimizedPlan
    val logical = lp.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        "orderBy=" + w.orderSpec.map(_.sql).mkString(", ")
    }
    val cached = lp.collect { case im: InMemoryRelation => im.cachedPlan }
    logical ++ cached.flatMap(physWindows)
  }

  /** Every forced broadcast hint reachable from `df`'s ANALYZED plan.
    * The analyzed tree is the right place to look: the optimizer
    * erases `ResolvedHint` nodes into the join's `JoinHint`, and cache
    * substitution (which runs later still) hides persisted subtrees
    * behind `InMemoryRelation` leaves — analyzed has neither problem.
    * A hard `broadcast()` hint bypasses AQE's size check entirely, so
    * every one in the catalog must be bounded BY CONSTRUCTION
    * (centroid sets, per-lang stats, single-row scalars…); the
    * ScalePropertiesSpec allowlist documents each entry's bound.
    */
  def broadcastHints(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        h.child.nodeName + "[" +
          h.child.output.take(4).map(_.name).mkString(", ") +
          (if (h.child.output.size > 4) ", …" else "") + "]"
    }
  }

  private def physWindows(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => physWindows(a.executedPlan)
    case q: QueryStageExec => physWindows(q.plan)
    case i: InMemoryTableScanExec => physWindows(i.relation.cachedPlan)
    case w: WindowExec if w.partitionSpec.isEmpty =>
      ("orderBy=" + w.orderSpec.map(_.sql).mkString(", ")) +:
        w.children.flatMap(physWindows)
    case other => other.children.flatMap(physWindows)
  }
}
