package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Scan, Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** Carries a V1-fallback scan's statistics across the pushdown boundary.
  *
  * `V2ScanRelationPushDown` wraps every [[V1Scan]] in a [[V1ScanWrapper]]
  * that implements only `Scan` — so a connector scan's
  * [[SupportsReportStatistics]] is silently dropped, and
  * `DataSourceV2ScanRelation.computeStats` falls back to
  * `defaultSizeInBytes` (≈8 EiB). Join planning then never broadcasts a
  * graft table, no matter how small its pruned candidate set is.
  *
  * [[StatsV1ScanWrapper]] is the same wrapper with the statistics
  * interface re-attached (delegating to the wrapped scan, which computes
  * them from manifest metadata); [[StatsShim]] is the pre-CBO rule that
  * swaps it in. A subclass, not a replacement: the physical planner's
  * `V1ScanWrapper(scan, pushed, ops)` extractor keeps matching, so
  * execution is byte-identical — only logical `computeStats` changes.
  * Lives in this `org.apache.spark.sql` subpackage like [[DmlShim]]
  * (`V1ScanWrapper`/`PushedDownOperators` are `private[sql]`).
  *
  * Registration rides `spark.experimental.extraOptimizations` (the "User
  * Provided Optimizers" batch), NOT an extensions hook: of all injection
  * points, only that batch runs AFTER "Early Filter and Projection
  * Push-Down" creates the wrapper — `injectPreCBORule` lands before it
  * (verified against the 4.1 batch list) and would see unpushed
  * relations. [[graft.sql.GraftCatalog.initialize]] registers it, so the
  * rule is in place before the first catalog query optimizes.
  */
final class StatsV1ScanWrapper(
    v1: V1Scan with SupportsReportStatistics,
    handled: Seq[Filter],
    ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = v1.estimateStatistics()

  // the parent is a case class, so the subclass would compare STRUCTURALLY
  // EQUAL to the wrapper it replaces — and TreeNode.transform's fastEquals
  // would throw the replacement away as a no-op. Class-aware equality
  // keeps the swap visible to the optimizer (and keeps it symmetric).
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _                     => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

object StatsShim extends Rule[LogicalPlan] {

  /** Idempotently append this rule to the session's user-provided
    * optimizer batch (the only hook that runs post-pushdown). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(StatsShim))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StatsShim
  }

  private def upgradable(s: Scan): Boolean = s match {
    case w: V1ScanWrapper =>
      !w.isInstanceOf[SupportsReportStatistics] &&
        w.v1Scan.isInstanceOf[SupportsReportStatistics]
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case rel: DataSourceV2ScanRelation if upgradable(rel.scan) =>
      val w = rel.scan.asInstanceOf[V1ScanWrapper]
      rel.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan.asInstanceOf[V1Scan with SupportsReportStatistics],
        w.handledFilters, w.pushedDownOperators))
  }
}
