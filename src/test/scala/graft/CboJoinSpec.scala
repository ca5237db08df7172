package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The CBO payoff, plan-pinned BOTH WAYS (VERDICT r9 #5): with the
  * broadcast threshold below the dim's on-disk size,
  *   - cbo OFF: the size-only estimator carries the dim's FULL size
  *     through the filter → the join must sort-merge (fact shuffles);
  *   - cbo ON: the scan's exact o_totalprice min/max feed
  *     FilterEstimation, the `< 5000` slice of a [≈1e3, ≈5e5] range
  *     estimates under the threshold → BroadcastHashJoin, zero fact
  *     shuffle.
  * Same query builder, same data, same threshold — the only delta is
  * whether the planner CONSUMES the statistics the scan reports.
  * Results are identical either way (the flip is a plan choice, never
  * a semantic one).
  */
class CboJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val roots: (String, String) =
    graft.ops.TpcH.cboEnsure(spark, "/root/testdata/sf0.01")

  private def childSession(cbo: Boolean, threshold: Long) = {
    val s = spark.newSession()
    Seq("spark.sql.session.timeZone", "spark.sql.shuffle.partitions",
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition")
      .foreach(k => spark.conf.getOption(k).foreach(s.conf.set(k, _)))
    s.conf.set("spark.sql.cbo.enabled", cbo.toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", threshold.toString)
    s
  }

  test("cbo ON: exact scan stats shrink the filtered dim below the threshold -> broadcast") {
    val (lRoot, oRoot) = roots
    val dimBytes = graft.io.Upsert.stats(spark, oRoot).get.liveBytes
    val s = childSession(cbo = true, threshold = math.max(1L, dimBytes / 2))
    val df = graft.ops.TpcH.cboJoin(s, lRoot, oRoot)
    val plan = df.queryExecution.sparkPlan // the PLANNED choice, pre-AQE
    assert(plan.collectFirst { case b: BroadcastHashJoinExec => b }.isDefined,
      s"cbo must broadcast the stats-shrunk dim:\n$plan")
    assert(plan.collectFirst { case m: SortMergeJoinExec => m }.isEmpty, plan.toString)
  }

  test("cbo OFF: the size-only estimate keeps the dim over the threshold -> sort-merge") {
    val (lRoot, oRoot) = roots
    val dimBytes = graft.io.Upsert.stats(spark, oRoot).get.liveBytes
    val s = childSession(cbo = false, threshold = math.max(1L, dimBytes / 2))
    val df = graft.ops.TpcH.cboJoin(s, lRoot, oRoot)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collectFirst { case m: SortMergeJoinExec => m }.isDefined,
      s"without cbo the filtered dim must NOT broadcast:\n$plan")
  }

  test("both plans return the same rows; the graded head takes the broadcast one") {
    val (lRoot, oRoot) = roots
    val dimBytes = graft.io.Upsert.stats(spark, oRoot).get.liveBytes
    def rows(cbo: Boolean) = {
      val s = childSession(cbo, math.max(1L, dimBytes / 2))
      graft.ops.TpcH.cboJoin(s, lRoot, oRoot)
        .as[(Long, Long, Long)].collect().sorted.toSeq
    }
    val on = rows(cbo = true)
    assert(on.nonEmpty && on == rows(cbo = false))
    // the registered head really plans the broadcast form
    val head = graft.SparkEntry.queries("q_cbo_broadcast_flip")(
      spark, "/root/testdata/sf0.01")
    assert(head.queryExecution.sparkPlan
      .collectFirst { case b: BroadcastHashJoinExec => b }.isDefined)
  }
}
