package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.KeyGroupedPartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Auto-select the PARTIALLY-CLUSTERED storage-partitioned-join form on
  * skewed bucket layouts (VERDICT r9 #4).
  *
  * A grouped SPJ join of two same-bucketed [[graft.io.Upsert]] tables
  * plans one task per bucket — perfect on uniform layouts (zero
  * exchange, minimal tasks), a straggler factory when one bucket holds
  * a large share of the table: AQE's skew-join cannot split it because
  * SPJ elided the exchange it operates on. Spark's rescue is
  * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  * .enabled`, but as a SESSION conf it is per-query exclusive with
  * shuffle-one-side SPJ (the [[graft.io.MergeOnRead]] big-delta
  * resolve, `bucket(n, pk)` small-side routing), so nobody can leave it
  * on globally — r9 shipped it as the opt-in
  * [[graft.io.Bucketing.withPartialClustering]] wrapper.
  *
  * This rule makes the selection automatic and per-JOIN: it runs as an
  * AQE query-stage preparation rule (after Spark's own
  * EnsureRequirements has built the grouped SPJ), finds joins whose
  * both children are key-group partitioned with no exchange in
  * between — i.e. the exchange-free zip actually happened — asks the
  * participating [[UpsertBucketScan]]s for their manifest-derived
  * bucket-byte skew (driver metadata, no job), and when max/median
  * exceeds `spark.graft.spj.skewRatio` (default 4) re-plans JUST THAT
  * JOIN SUBTREE through EnsureRequirements under a scoped conf clone
  * with partial clustering enabled: the hot side fans out across its
  * byte-range splits, the other side's matching partitions replicate.
  * Uniform layouts keep the grouped form; queries that never SPJ-join
  * are untouched; the session conf is never mutated, so concurrent
  * shuffle-one-side plans keep their optimization.
  *
  * Defensive contract: if the re-planned subtree somehow acquires a
  * shuffle (it never should — the inputs already satisfied the join's
  * distribution), the original grouped plan is kept: the per-join form
  * may only ever trade one-task-per-bucket for split-level fan-out,
  * never introduce an exchange.
  *
  * Shapes the per-join form must REFUSE (an ancestor consumed the
  * grouped distribution — re-planning just the join would feed it
  * duplicated keys) fall back to re-running the WHOLE plan's
  * requirements under the scoped conf (VERDICT r10 #4): that is the
  * proven-safe `Bucketing.withPartialClustering` semantics —
  * EnsureRequirements re-validates every ancestor and inserts the
  * exchange the fan-out now demands above the join, so a skewed
  * co-located join FEEDING AN AGGREGATE trades its straggler for
  * split-level fan-out plus one partial→final agg exchange. Budgeted:
  * the whole-plan form is kept only if it engaged partial clustering
  * and added at most one exchange per rescued join.
  */
case class AutoPartialClusteringRule(session: SparkSession)
    extends Rule[SparkPlan] {

  private val PcKey =
    "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"

  override def apply(plan: SparkPlan): SparkPlan = {
    val enabled = session.conf
      .get("spark.graft.spj.autoPartialClustering", "true").toBoolean
    // the user already scoped the conf on (Bucketing.withPartialClustering):
    // Spark's own EnsureRequirements has done the work
    val alreadyOn = session.conf.get(PcKey, "false").toBoolean
    if (!enabled || alreadyOn) return plan
    val threshold = session.conf.get("spark.graft.spj.skewRatio", "4.0").toDouble
    var refused = 0
    val perJoin = plan transformUp {
      case j if isSpjJoin(j) && !alreadyPartial(j) && maxSkew(j) >= threshold =>
        if (ancestorsTransparent(plan, j)) rerunPartiallyClustered(j)
        else { refused += 1; j }
    }
    if (refused == 0) return perJoin
    // WHOLE-PLAN fallback (VERDICT r10 #4): a skewed join under a
    // distribution-consuming ancestor (an aggregate whose exchange the
    // global pass elided against the grouped output) cannot be
    // re-planned in isolation — but re-running the ENTIRE plan's
    // requirements under the scoped conf is the proven-safe
    // Bucketing.withPartialClustering semantics: EnsureRequirements
    // re-validates every ancestor and INSERTS the exchange the
    // fan-out now demands above the join. Accepted only when partial
    // clustering actually engaged and the plan gained at most one
    // exchange per rescued join (a regression of an unrelated
    // shuffle-one-side SPJ elsewhere in the plan would exceed that
    // budget and the grouped plan stays).
    if (!session.conf.get("spark.graft.spj.wholePlanFallback", "true").toBoolean)
      return perJoin
    val pristine = plan transformUp {
      case b: BatchScanExec => b.copy(spjParams = b.spjParams.copy(
        commonPartitionValues = None, reducers = None,
        applyPartialClustering = false, replicatePartitions = false))
    }
    val whole = org.apache.spark.sql.graft.Bridge
      .withConfOverride(session, Map(PcKey -> "true")) {
        org.apache.spark.sql.execution.exchange.EnsureRequirements()
          .apply(pristine)
      }
    val gotPartial = whole.collect { case b: BatchScanExec => b }
      .exists(_.spjParams.applyPartialClustering)
    def shuffles(p: SparkPlan): Int =
      p.collect { case s: ShuffleExchangeLike => s }.size
    if (gotPartial && shuffles(whole) <= shuffles(plan) + refused) whole
    else perJoin
  }

  /** True when NO operator between `j` and the next shuffle above it
    * (or the plan root) REQUIRES a distribution from j's subtree.
    *
    * The re-plan changes the join's output partitioning — partially
    * clustered means the SAME key can appear in several partitions
    * (Spark's own KeyGroupedPartitioning.satisfies0 returns false for
    * ClusteredDistribution in that mode). An ancestor whose exchange
    * the global EnsureRequirements pass already elided against the
    * GROUPED output (an aggregate or window on the join key, a second
    * SPJ join) would then run partition-local over duplicated keys —
    * wrong rows, not just a slow plan. Nothing re-validates after
    * custom prep rules, so the rule must refuse those shapes itself:
    * the grouped (one-task-per-bucket) plan stays, and callers who
    * want the fan-out under an aggregate use
    * [[graft.io.Bucketing.withPartialClustering]], which re-runs the
    * WHOLE plan's requirements under the conf. An exchange above the
    * join insulates everything past it (it re-partitions).
    */
  private def ancestorsTransparent(root: SparkPlan, j: SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
    // path from root down to j (exclusive); None when j unreachable
    def path(node: SparkPlan): Option[List[(SparkPlan, Int)]] =
      if (node eq j) Some(Nil)
      else node.children.zipWithIndex.view
        .flatMap { case (c, i) => path(c).map((node, i) :: _) }
        .headOption
    path(root) match {
      case None => false // can't prove safety: refuse
      case Some(chain) =>
        // only the segment BELOW the last exchange above j matters
        val below = chain.reverse.takeWhile {
          case (n, _) => !n.isInstanceOf[ShuffleExchangeLike]
        }
        below.forall { case (n, i) =>
          n.requiredChildDistribution(i) == UnspecifiedDistribution
        }
    }
  }

  /** A join whose both children arrive key-group partitioned with no
    * shuffle below — the exchange-free SPJ zip.
    */
  private def isSpjJoin(p: SparkPlan): Boolean = p match {
    case j @ (_: SortMergeJoinExec | _: ShuffledHashJoinExec) =>
      j.children.forall(c =>
        c.outputPartitioning.isInstanceOf[KeyGroupedPartitioning] &&
          c.collectFirst { case s: ShuffleExchangeLike => s }.isEmpty)
    case _ => false
  }

  private def scansOf(p: SparkPlan): Seq[UpsertBucketScan] =
    p.collect { case b: BatchScanExec => b.scan }
      .collect { case s: UpsertBucketScan => s }

  private def alreadyPartial(j: SparkPlan): Boolean =
    j.collect { case b: BatchScanExec => b }
      .exists(_.spjParams.applyPartialClustering)

  private def maxSkew(j: SparkPlan): Double =
    scansOf(j).map(_.bucketSkewRatio).foldLeft(0.0)(math.max)

  private def rerunPartiallyClustered(j: SparkPlan): SparkPlan = {
    // reset EnsureRequirements' first-pass SPJ bookkeeping (merged
    // partition values / clustering flags) so the re-plan derives the
    // partially-clustered params fresh — but KEEP keyGroupedPartitioning
    // and joinKeyPositions, which the planner stamped at strategy time
    // and the scan's reported partitioning depends on
    val pristine = j transformUp {
      case b: BatchScanExec => b.copy(spjParams = b.spjParams.copy(
        commonPartitionValues = None, reducers = None,
        applyPartialClustering = false, replicatePartitions = false))
    }
    val replanned = org.apache.spark.sql.graft.Bridge
      .withConfOverride(session, Map(PcKey -> "true")) {
        org.apache.spark.sql.execution.exchange.EnsureRequirements()
          .apply(pristine)
      }
    val gotShuffle =
      replanned.collectFirst { case s: ShuffleExchangeLike => s }.nonEmpty
    val gotPartial = replanned.collect { case b: BatchScanExec => b }
      .exists(_.spjParams.applyPartialClustering)
    if (gotShuffle || !gotPartial) j else replanned
  }
}

/** Test/probe access to scan internals the suite packages cannot see. */
object AutoSpjProbe {
  def skewOf(s: org.apache.spark.sql.connector.read.Scan): Option[Double] =
    s match { case u: UpsertBucketScan => Some(u.bucketSkewRatio); case _ => None }
}
