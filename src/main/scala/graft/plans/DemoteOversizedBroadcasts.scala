package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-wide safety net against runaway broadcast hints: strips the
  * BROADCAST strategy from a join side whose optimizer-estimated size
  * exceeds `spark.graft.maxBroadcastBytes` (default 512 MB — the same
  * budget [[graft.Tables.maybeBroadcast]] applies at the API layer).
  *
  * Why a Rule and not just the API helper: the helper protects the
  * library's own call sites, but an extensions-enabled session also
  * runs user SQL (`/*+ BROADCAST(t) */`) and ad-hoc DataFrame code
  * where a hint written at notebook scale silently becomes a
  * multi-GB driver OOM at corpus scale — the exact hazard the r5
  * review found in multiprobeTopK. The rule runs post-optimization
  * (after EliminateResolvedHint folds hints into [[Join]] nodes), so
  * it sees the same JoinHint that physical planning's JoinSelection
  * consumes, and it reads the same Catalyst statistics the planner
  * uses — no extra jobs. Demotion only removes the strategy hint:
  * AQE is still free to re-introduce a broadcast at runtime if the
  * side turns out small, which is the desired asymmetry (runtime
  * evidence may upgrade, a static guess may not force).
  *
  * Limits, documented not hidden: leaf stats are file sizes, so a
  * plan that EXPANDS data above the scan (explode over shingles) can
  * still under-estimate — call sites that generate rows must keep
  * applying their own expansion factor (see Tables.maybeBroadcast's
  * leaf-expansion handling); this rule is the coarse outer fence.
  */
case class DemoteOversizedBroadcasts(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def budget: Long =
    session.conf.getOption("spark.graft.maxBroadcastBytes")
      .map(_.toLong).getOrElse(512L << 20)

  private def demote(h: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
    h match {
      case Some(hi) if hi.strategy.contains(BROADCAST) &&
          side.stats.sizeInBytes > budget =>
        logWarning(s"graft: demoting BROADCAST hint — estimated " +
          s"${side.stats.sizeInBytes} bytes exceeds budget $budget")
        val stripped = hi.copy(strategy = None)
        if (stripped == HintInfo()) None else Some(stripped)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join if j.hint != JoinHint.NONE =>
      val nh = JoinHint(demote(j.hint.leftHint, j.left),
        demote(j.hint.rightHint, j.right))
      if (nh == j.hint) j else j.copy(hint = nh)
  }
}
