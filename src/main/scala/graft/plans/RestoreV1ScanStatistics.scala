package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Restore the statistics face of a V1-fallback scan (r19 — VERDICT r18
  * #4): [[org.apache.spark.sql.execution.datasources.v2
  * .V2ScanRelationPushDown]] wraps a connector's
  * [[org.apache.spark.sql.connector.read.V1Scan]] in a
  * [[V1ScanWrapper]] that implements only `Scan`, so a V1Scan that ALSO
  * reports [[SupportsReportStatistics]] (the graft.commitlog
  * merge-on-read route, whose commit record knows the exact visible row
  * count) loses it — [[DataSourceV2ScanRelation.computeStats]] then
  * falls back to `defaultSizeInBytes` (effectively infinite) and a tiny
  * deletion-vector-bearing dim can never auto-broadcast. This rule
  * re-wraps with a subclass forwarding `estimateStatistics` to the
  * inner scan. It MUST run after the push-down batch created the
  * wrapper — every SparkSessionExtensions hook (optimizer rule,
  * pre-CBO) is sequenced BEFORE that batch, so it installs as
  * `experimental.extraOptimizations` ("User Provided Optimizers", the
  * LAST batch) via [[graft.GraftSession.install]]. Idempotent by the
  * type guard; scans whose V1Scan reports no statistics pass
  * untouched. */
object RestoreV1ScanStatistics extends Rule[LogicalPlan] {

  private final class StatsV1ScanWrapper(
      v1: V1Scan with SupportsReportStatistics,
      w: V1ScanWrapper)
    extends V1ScanWrapper(v1, w.handledFilters, w.pushedDownOperators)
    with SupportsReportStatistics {
    override def estimateStatistics()
        : org.apache.spark.sql.connector.read.Statistics =
      v1.estimateStatistics()
    // WITHOUT these the rewrite is a no-op: the subclass inherits the
    // case class's field-wise equals, so TreeNode.transform sees the
    // rewrapped relation as fastEquals-identical (in BOTH directions —
    // equals and canEqual each cover one) and keeps the original node
    override def canEqual(that: Any): Boolean =
      that.isInstanceOf[StatsV1ScanWrapper]
    override def equals(that: Any): Boolean = that match {
      case _: StatsV1ScanWrapper => super.equals(that)
      case _ => false
    }
    override def hashCode(): Int = super.hashCode() * 31 + 1
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
        if !w.isInstanceOf[StatsV1ScanWrapper] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics] =>
      r.copy(scan = new StatsV1ScanWrapper(
        w.v1Scan.asInstanceOf[V1Scan with SupportsReportStatistics], w))
  }
}
