package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.Upsert
import graft.sources.UpsertBucketSource

/** DSv2 ordering report ([[graft.sources.UpsertBucketScan]]
  * `outputOrdering`, backlog item "SupportsReportOrdering"): a
  * clustered compact stages each file sorted by its cluster columns
  * and records (sortedBy, sortedGen) in the manifest; the scan reports
  * that per-partition order, so a co-located sort-merge join consumes
  * the table with ZERO Exchange AND ZERO Sort. Honesty is
  * file-granular through the generation: any later write stages files
  * under a new generation and the report silently withdraws — wrong
  * answers are structurally unreachable, the plan just re-sorts.
  */
class SortedScanSpec extends SparkSpec {
  import spark.implicits._

  /** Upsert table of n rows, bucketed by k, then clustered-compacted
    * so every bucket holds ONE file sorted by k.
    */
  private def mkSorted(n: Int, buckets: Int, tag: String): String = {
    val dir = Files.createTempDirectory("sorted_scan").toString
    val df = spark.range(n).select(
      concat(lit("k"), format_string("%06d", col("id"))).as("k"),
      lit(1L).as("ver"),
      concat(lit(tag), col("id")).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = buckets)
    // rewrite EVERY non-empty bucket sorted (maxFilesPerBucket = 0)
    Upsert.compactBuckets(spark, dir, Seq("k"), maxFilesPerBucket = 0,
      clusterBy = Seq("k"))
    dir
  }

  private def withSpjConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // the point of the report is eliding the sort under SMJ
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(plan(df)).size

  private def sorts(df: DataFrame): Int =
    raw"\bSort\b".r.findAllIn(plan(df)).size

  test("co-located SMJ over two clustered tables: zero Exchange, zero Sort, rows exact") {
    val dirA = mkSorted(500, 4, "a")
    val dirB = mkSorted(400, 4, "b")
    withSpjConfs {
      val joined = graft.io.Bucketing
        .colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
        .select(col("l.k"), col("l.v").as("va"), col("r.v").as("vb"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(exchanges(joined) == 0, s"co-located join must not shuffle:\n$p")
      assert(sorts(joined) == 0,
        s"both sides are scan-sorted by the join key — no Sort expected:\n$p")
      val got = joined.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      val want = (0 until 400)
        .map(i => (f"k$i%06d", s"a$i", s"b$i")).sortBy(_._1)
      assert(got.toSeq == want)
    }
  }

  test("catalog pk-only SQL join: bucket(n,pk) SPJ + scan order = zero Exchange, zero Sort") {
    val dirA = mkSorted(500, 4, "a")
    val dirB = mkSorted(400, 4, "b")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.UpsertCatalog].getName)
    withSpjConfs {
      val j = spark.sql(
        s"""SELECT x.k, x.v AS va, y.v AS vb
            FROM graft.`$dirA` x JOIN graft.`$dirB` y ON x.k = y.k""")
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(exchanges(j) == 0, s"pk-only catalog join must not shuffle:\n$p")
      assert(sorts(j) == 0,
        s"catalog scans report the cluster order — no Sort expected:\n$p")
      assert(j.count() == 400)
      assert(j.filter(col("k") === "k000003").select("va", "vb")
        .as[(String, String)].head() == (("a3", "b3")))
    }
  }

  test("a post-compact merge withdraws the report: the join re-sorts, rows stay exact") {
    val dirA = mkSorted(300, 4, "a")
    val dirB = mkSorted(300, 4, "b")
    // one correction lands a NEW-generation file in one bucket of A
    Upsert.merge(spark, dirA,
      Seq(("k000007", 2L, "a7fix")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 4)
    withSpjConfs {
      val joined = graft.io.Bucketing
        .colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
        .select(col("l.k"), col("l.v").as("va"), col("r.v").as("vb"))
      val p = plan(joined)
      assert(exchanges(joined) == 0, s"SPJ itself still holds:\n$p")
      assert(sorts(joined) > 0,
        s"A carries a post-sort generation file — its side must re-sort:\n$p")
      assert(joined.filter(col("k") === "k000007").select("va")
        .as[String].head() == "a7fix")
      assert(joined.count() == 300)
    }
  }

  test("ordering withdraws when a kept bucket holds more than one slice") {
    val dir = Files.createTempDirectory("sorted_scan_multi").toString
    val df = spark.range(200).select(
      concat(lit("k"), format_string("%06d", col("id"))).as("k"),
      lit(1L).as("ver"), col("id").as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = 2)
    // clustered compact into TWO range-disjoint sorted files per bucket
    Upsert.compactBuckets(spark, dir, Seq("k"), maxFilesPerBucket = 0,
      clusterBy = Seq("k"), filesPerBucket = 2)
    val scanOrdering = {
      val t = graft.sources.UpsertBucketSource.read(spark, dir)
      // two files per bucket → two slices → the bin-packed partition
      // order is unknown → no report (zone pruning to ≤1 file would
      // restore it; the refusal is per-scan, not per-table)
      t.queryExecution.executedPlan.toString
    }
    // the physical plan prints no ordering for the scan; assert via the
    // connector report directly for precision
    val table = graft.sources.UpsertBucketSource.read(spark, dir)
    val scans = table.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, scanOrdering)
    assert(scans.head.outputOrdering.isEmpty,
      "multi-slice buckets must not claim order")
  }

  test("MOR big-delta resolve: the sorted base feeds the full-outer SMJ with no base-side Sort") {
    import graft.io.MergeOnRead
    val root = Files.createTempDirectory("mor_sorted").toString
    val dir = s"$root/t"
    def wave(rows: Seq[(String, Long, Long, String)]) =
      MergeOnRead.merge(spark, dir, rows.toDF("id", "ver", "cents", "op"))
    wave((1 to 500).map(i => (f"k$i%04d", 1L, i.toLong, "insert")))
    MergeOnRead.compact(spark, dir, Seq("id"), "ver", Some("op"),
      numBuckets = 4) // sortBase default: one pk-sorted file per bucket
    wave(Seq(("k0002", 2L, 222L, "update"), ("kX", 2L, 5L, "insert")))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = MergeOnRead.read(spark, dir, Seq("id"), "ver", Some("op"),
        maxBroadcastDeltaBytes = 0L) // force the SPJ resolve
      val plan = df.queryExecution.executedPlan
      val sortNodes = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sortNodes.nonEmpty, "the delta side still sorts")
      sortNodes.foreach(s => assert(!s.toString.contains("UpsertBucketScan"),
        s"the base must reach the SMJ pre-sorted (scan ordering report):\n$plan"))
      val rows = df.collect().map(r =>
        (r.getString(0), r.getLong(2))).toMap
      assert(rows("k0002") == 222L && rows("kX") == 5L && rows.size == 501)
      // opt-out keeps the previous shape: unsorted base, SMJ re-sorts it
      val dir2 = s"$root/u"
      MergeOnRead.merge(spark, dir2,
        (1 to 100).map(i => (f"k$i%04d", 1L, i.toLong, "insert"))
          .toDF("id", "ver", "cents", "op"))
      MergeOnRead.compact(spark, dir2, Seq("id"), "ver", Some("op"),
        numBuckets = 4, sortBase = false)
      MergeOnRead.merge(spark, dir2,
        Seq(("k0001", 2L, 11L, "update")).toDF("id", "ver", "cents", "op"))
      val df2 = MergeOnRead.read(spark, dir2, Seq("id"), "ver", Some("op"),
        maxBroadcastDeltaBytes = 0L)
      val baseSorts = df2.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec
            if s.toString.contains("UpsertBucketScan") => s
      }
      assert(baseSorts.nonEmpty, "opt-out base must re-sort under the SMJ")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("multi-partition SPJ groups withdraw the ordering at exec: the join re-sorts, rows exact") {
    // tiny maxPartitionBytes splits each sorted one-file bucket into
    // several single-slice partitions; the scan still REPORTS the
    // order (each partition is honestly sorted), but Spark's own
    // exec-side guard (DataSourceV2ScanExecBase: ordering only for
    // one-partition groups) must withdraw it when the group
    // concatenates partitions — wrong answers are unreachable, the
    // plan just pays its sort again
    val dirA = mkSorted(400, 2, "a")
    val dirB = mkSorted(400, 2, "b")
    withSpjConfs {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      try {
        val joined = graft.io.Bucketing
          .colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
          .select(col("l.k"), col("l.v").as("va"), col("r.v").as("vb"))
        val p = plan(joined)
        assert(exchanges(joined) == 0, s"still co-located:\n$p")
        assert(sorts(joined) > 0,
          s"multi-partition groups must re-sort (exec-side guard):\n$p")
        assert(joined.count() == 400)
        assert(joined.filter(col("k") === "k000123").select("va", "vb")
          .as[(String, String)].head() == (("a123", "b123")))
      } finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    }
  }

  test("manifest surfaces sortedBy/sortedGen; DataFrame path trails with __bucket") {
    val dir = mkSorted(100, 2, "a")
    val l = Upsert.bucketLayout(spark, dir)
    assert(l.sortedBy == Seq("k"))
    assert(l.sortedGens.nonEmpty)
    // DataFrame-path report: (k, __bucket) — the cluster order plus the
    // constant-per-partition trail, matching colocatedJoin's required
    // (pk, __bucket) SMJ key order
    val df = UpsertBucketSource.read(spark, dir)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    val cols = scan.outputOrdering.map(_.child.toString)
    assert(cols.length == 2 && cols.head.startsWith("k") &&
      cols(1).contains("__bucket"), cols.mkString(", "))
  }
}
