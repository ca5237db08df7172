package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** Auto-selected partially-clustered SPJ on skewed layouts
  * (VERDICT r9 #4): an UNANNOTATED catalog SQL join of two
  * same-bucketed tables whose layout is hot-bucket skewed re-plans to
  * the partially-clustered form (hot bucket fans out across byte-range
  * splits) with the session conf untouched; uniform layouts keep the
  * grouped one-task-per-bucket plan; an opt-out conf restores r9
  * behavior. All shapes stay exchange-free and row-exact.
  */
class AutoSpjSpec extends SparkSpec {
  import spark.implicits._

  private val PcKey =
    "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
  private val Buckets = 8

  private lazy val catalogReady: Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)

  /** Keys chosen so ONE bucket holds a large multiple of the median
    * bucket's bytes (keep all of bucket 0's keys, 1-in-6 of the rest).
    */
  private def mkSkewed(n: Int, tag: String): String = {
    val dir = Files.createTempDirectory("autospj_hot").toString
    val all = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), col("id"),
      lit(1L).as("ver"),
      concat(lit(tag), col("id")).as("v"))
    val hot = all.filter(
      pmod(xxhash64(col("k")), lit(Buckets)) === 0 || col("id") % 6 === 0)
      .drop("id")
    Upsert.merge(spark, dir, hot, pk = Seq("k"), versionCol = "ver",
      numBuckets = Buckets)
    dir
  }

  private def mkUniform(n: Int, tag: String): String = {
    val dir = Files.createTempDirectory("autospj_uni").toString
    val df = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      concat(lit(tag), col("id")).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = Buckets)
    dir
  }

  /** Execute, then return the FINAL adaptive plan, unwrapped past the
    * query-stage leaves AQE folds the executed tree into. */
  private def finalPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    unwrap(df.queryExecution.executedPlan)
  }

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => unwrap(q.plan)
    case other => other
  }

  /** Every node, DESCENDING through AQE query-stage leaves (a
    * materialized ShuffleQueryStage is a LeafExecNode — plain collect
    * never sees the join/scans it wraps).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
    allNodes(p).collect { case b: BatchScanExec => b }

  private def joinSql(a: String, b: String): String =
    s"""SELECT a.k, a.v AS va, b.v AS vb
        FROM graft.`$a` a JOIN graft.`$b` b ON a.k = b.k"""

  /** No broadcast (force the SPJ shape) and tiny split targets so a
    * hot bucket's file chunks into several byte-range splits — at
    * production sizes maxPartitionBytes does this naturally. */
  private def withJoinConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "1024")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewed layout: UNANNOTATED catalog SQL join auto-selects partial clustering") {
    catalogReady
    val a = mkSkewed(30000, "a")
    val b = mkSkewed(30000, "b")
    withJoinConfs {
      val df = spark.sql(joinSql(a, b))
      val plan = finalPlan(df)
      val ps = plan.toString
      assert(!ps.contains("ShuffleExchange") && !ps.contains("Exchange hashpartitioning"),
        s"auto partial clustering must stay exchange-free:\n$ps")
      assert(scans(plan).exists(_.spjParams.applyPartialClustering),
        s"skewed join must re-plan partially clustered:\n$ps")
      // fan-out really happened: more join partitions than buckets
      val joinNode = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.get
      assert(joinNode.outputPartitioning.numPartitions > Buckets,
        s"hot bucket must fan out past one-task-per-bucket: " +
          s"${joinNode.outputPartitioning.numPartitions} <= $Buckets")
      // rows exact vs the naive recompute
      val aDf = graft.sources.UpsertBucketSource.read(spark, a)
        .select(col("k"), col("v").as("va"))
      val bDf = graft.sources.UpsertBucketSource.read(spark, b)
        .select(col("k"), col("v").as("vb"))
      val want = aDf.join(bDf, "k").as[(String, String, String)].collect().sorted.toSeq
      val got = df.as[(String, String, String)].collect().sorted.toSeq
      assert(got == want)
      // the session conf was never mutated
      assert(!spark.conf.get(PcKey, "false").toBoolean)
    }
  }

  test("uniform layout keeps the grouped one-task-per-bucket SPJ") {
    catalogReady
    val a = mkUniform(5000, "a")
    val b = mkUniform(5000, "b")
    withJoinConfs {
      val df = spark.sql(joinSql(a, b))
      val plan = finalPlan(df)
      val ps = plan.toString
      assert(!ps.contains("ShuffleExchange"),
        s"uniform SPJ join must stay exchange-free:\n$ps")
      assert(!scans(plan).exists(_.spjParams.applyPartialClustering),
        s"uniform layout must keep the grouped form:\n$ps")
      assert(df.count() == 5000)
    }
  }

  test("agg-above-join: the WHOLE-PLAN fallback fans the skewed join out, exchange re-inserted, groups exact") {
    catalogReady
    // the global EnsureRequirements pass elided the exchange between
    // the SPJ join and the final aggregate clustered on the join key —
    // the per-join re-plan must refuse that shape (duplicated keys
    // would reach a partition-local aggregate). The rule now falls
    // back to re-running the WHOLE plan's requirements under the
    // scoped conf (VERDICT r10 #4): the join fans out across the hot
    // bucket's splits AND EnsureRequirements re-inserts the
    // partial→final aggregate exchange, so every group stays exact.
    val a = mkSkewed(20000, "a")
    val b = mkSkewed(20000, "b")
    withJoinConfs {
      val df = spark.sql(
        s"""SELECT a.k, count(*) AS c
            FROM graft.`$a` a JOIN graft.`$b` b ON a.k = b.k
            GROUP BY a.k""")
      val plan = finalPlan(df)
      assert(scans(plan).exists(_.spjParams.applyPartialClustering),
        s"whole-plan fallback must fan the skewed join out:\n$plan")
      // the fan-out's price: exactly one exchange, ABOVE the join
      // (between partial and final agg), none below it
      val joinNode = allNodes(plan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.get
      assert(joinNode.collectFirst {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }.isEmpty, s"no exchange may enter the join's subtree:\n$plan")
      assert(joinNode.outputPartitioning.numPartitions > Buckets,
        "hot bucket must fan out past one-task-per-bucket")
      // every key joins exactly once: a duplicated group would show as
      // c != 1 or a wrong distinct count
      val rows = df.as[(String, Long)].collect()
      assert(rows.forall(_._2 == 1L),
        s"duplicate groups leaked: ${rows.filter(_._2 != 1L).take(5).mkString(",")}")
      val expect = graft.sources.UpsertBucketSource.read(spark, a)
        .select("k").count()
      assert(rows.length.toLong == expect)
    }
  }

  test("agg-above-join with the fallback OPTED OUT keeps the grouped plan; rows still exact") {
    catalogReady
    val a = mkSkewed(20000, "a")
    val b = mkSkewed(20000, "b")
    spark.conf.set("spark.graft.spj.wholePlanFallback", "false")
    try withJoinConfs {
      val df = spark.sql(
        s"""SELECT a.k, count(*) AS c
            FROM graft.`$a` a JOIN graft.`$b` b ON a.k = b.k
            GROUP BY a.k""")
      val plan = finalPlan(df)
      assert(!scans(plan).exists(_.spjParams.applyPartialClustering),
        s"opted-out fallback must keep the grouped (refused) form:\n$plan")
      val rows = df.as[(String, Long)].collect()
      assert(rows.forall(_._2 == 1L))
    } finally spark.conf.unset("spark.graft.spj.wholePlanFallback")
  }

  test("opt-out conf keeps the grouped plan even on a skewed layout") {
    catalogReady
    val a = mkSkewed(20000, "a")
    val b = mkSkewed(20000, "b")
    spark.conf.set("spark.graft.spj.autoPartialClustering", "false")
    try withJoinConfs {
      val plan = finalPlan(spark.sql(joinSql(a, b)))
      assert(!scans(plan).exists(_.spjParams.applyPartialClustering),
        s"opt-out must keep r9 behavior:\n$plan")
    } finally spark.conf.unset("spark.graft.spj.autoPartialClustering")
  }
}
