package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.{Bucketing, Upsert}
import graft.sources.UpsertBucketSource

/** The bucket is the placement unit, NOT the parallelism unit
  * (VERDICT r8 #1): the DSv2 bucket scan chunks each bucket's files
  * into `maxPartitionBytes` byte-range splits, so
  *  - a scan that opts out of the grouping report (`grouping=none`)
  *    gets one task per SPLIT — a 100×-grown bucket fans out instead
  *    of capping the scan at numBuckets;
  *  - a co-located join under partially-clustered distribution fans a
  *    hot bucket out across its splits (the other side's matching
  *    partition replicates) — the skew rescue AQE cannot provide once
  *    SPJ has elided the exchange it operates on;
  *  - the plain grouped SPJ still plans with ZERO Exchange and exact
  *    rows — multiple splits per bucket group back into one task.
  */
class SpjSplitSpec extends SparkSpec {
  import spark.implicits._

  /** Keys drawn so EVERY row hashes into one target bucket — the
    * hot-bucket shape (many distinct keys that happen to collide in
    * placement, the case re-bucketing can't fix a single hot KEY of
    * and partial clustering exists for).
    */
  private def hotTable(n: Int, buckets: Int, target: Int): String = {
    val dir = Files.createTempDirectory("spjsplit_hot").toString
    val df = spark.range(n * buckets * 2L)
      .select(concat(lit("k"), col("id")).as("k"))
      .filter(pmod(xxhash64(col("k")), lit(buckets)) === target)
      .limit(n)
      .select(col("k"), lit(1L).as("ver"),
        concat(lit("payload-"), col("k"), lit("-" + "x" * 64)).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = buckets)
    dir
  }

  private def mkTable(n: Int, buckets: Int, tag: String): String = {
    val dir = Files.createTempDirectory("spjsplit").toString
    val df = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"), lit(1L).as("ver"),
      concat(lit(tag), col("id")).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = buckets)
    dir
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjConfs: Seq[(String, String)] = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("grouping=none: a tiny maxPartitionBytes yields one task per split, rows exact") {
    val buckets = 4
    val dir = hotTable(2000, buckets, target = 1)
    // ONE file per bucket — the post-compaction shape where split-level
    // parallelism must come from byte-RANGE chunking, not file counts
    Upsert.compactBuckets(spark, dir, pk = Seq("k"), maxFilesPerBucket = 0)
    withConfs("spark.sql.files.maxPartitionBytes" -> "2048",
      "spark.sql.files.openCostInBytes" -> "0") {
      val ungrouped = UpsertBucketSource.read(spark, dir, grouping = Some("none"))
      assert(ungrouped.rdd.getNumPartitions > buckets,
        s"expected split-level fan-out, got ${ungrouped.rdd.getNumPartitions}")
      // grouped scan of the same table caps at one task per bucket
      val grouped = UpsertBucketSource.read(spark, dir)
      assert(grouped.rdd.getNumPartitions <= buckets)
      // byte-range slices cover each file exactly once — row coverage
      // checked by COLLECTING through both scan paths against the
      // PLAIN read (a bare .count() would be answered from manifest
      // metadata since the aggregate pushdown, proving nothing here)
      val truth = Upsert.read(spark, dir).select("k", "v")
        .collect().map(_.toString).sorted.toSeq
      assert(truth.size == 2000)
      val a = ungrouped.select("k", "v").collect().map(_.toString).sorted.toSeq
      val b = grouped.select("k", "v").collect().map(_.toString).sorted.toSeq
      assert(a == truth && b == truth)
    }
  }

  test("grouped SPJ with multi-split buckets still plans zero Exchange, rows exact") {
    val dirA = mkTable(500, 8, "a")
    val dirB = mkTable(400, 8, "b")
    withConfs(spjConfs ++ Seq(
      "spark.sql.files.maxPartitionBytes" -> "2048",
      "spark.sql.files.openCostInBytes" -> "0"): _*) {
      val joined = Bucketing.colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
        .select(col("l.k"), col("l.v").as("va"), col("r.v").as("vb"))
      assert(exchanges(joined) == 0,
        s"multi-split buckets must still co-locate:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      val want = (0 until 400).map(i => (s"k$i", s"a$i", s"b$i")).sortBy(_._1)
      assert(got.toSeq == want)
    }
  }

  test("partially-clustered join fans a hot bucket out across its splits") {
    val buckets = 4
    val hot = hotTable(800, buckets, target = 2)
    // the probe side: same layout, every hot key present
    val dirB = Files.createTempDirectory("spjsplit_b").toString
    Upsert.merge(spark, dirB,
      Upsert.read(spark, hot).select(col("k"), lit(1L).as("ver"),
        lit("b").as("w")),
      pk = Seq("k"), versionCol = "ver", numBuckets = buckets)
    withConfs(spjConfs ++ Seq(
      "spark.sql.files.maxPartitionBytes" -> "4096",
      "spark.sql.files.openCostInBytes" -> "0"): _*) {
      val groupedTasks = Bucketing
        .colocatedJoin(spark, hot, dirB, Seq("k" -> "k"))
        .rdd.getNumPartitions
      val (fanTasks, n) = Bucketing.withPartialClustering(spark) {
        val j = Bucketing.colocatedJoin(spark, hot, dirB, Seq("k" -> "k"))
        assert(exchanges(j) == 0,
          s"partial clustering must keep the join exchange-free:\n${j.queryExecution.executedPlan}")
        (j.rdd.getNumPartitions, j.count())
      }
      assert(n == 800, s"fan-out must not change the join result ($n)")
      assert(fanTasks > groupedTasks,
        s"hot bucket must fan out: $fanTasks tasks vs grouped $groupedTasks")
    }
  }

  test("the scan reports real size statistics (post-prune bytes, not 'infinite')") {
    val dir = mkTable(300, 8, "a")
    val plan = UpsertBucketSource.read(spark, dir).queryExecution.optimizedPlan
    val sz = plan.stats.sizeInBytes
    assert(sz > 0 && sz < (1L << 30),
      s"expected on-disk-scale sizeInBytes, got $sz")
    // a pushed __bucket prune shrinks the estimate with the file set
    val pruned = UpsertBucketSource.read(spark, dir)
      .filter(col("__bucket") === 3).queryExecution.optimizedPlan
    assert(pruned.stats.sizeInBytes < sz)
  }
}
