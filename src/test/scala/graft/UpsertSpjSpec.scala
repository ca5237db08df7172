package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.Upsert
import graft.sources.UpsertBucketSource

/** Storage-partitioned joins over Upsert tables: the DSv2 reader
  * reports bucket placement (KeyGroupedPartitioning + HasPartitionKey),
  * so same-bucketed tables join and aggregate on (bucket, pk) with
  * ZERO Exchange — and mismatched layouts degrade to a plain shuffle
  * join, never to wrong rows.
  */
class UpsertSpjSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(n: Int, buckets: Int, valueTag: String): String = {
    val dir = Files.createTempDirectory("spj").toString
    val df = spark.range(n).select(
      concat(lit("k"), col("id")).as("k"),
      lit(1L).as("ver"),
      concat(lit(valueTag), col("id")).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = buckets)
    dir
  }

  private def withSpjConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // partition keys ⊂ join keys — the default-true co-partition
      // check would force the exchange SPJ exists to elide
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("same-bucketed pk join plans with zero Exchange; rows exact") {
    val dirA = mkTable(500, 8, "a")
    val dirB = mkTable(400, 8, "b")
    withSpjConfs {
      val joined = graft.io.Bucketing
        .colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
        .select(col("l.k"), col("l.v").as("va"), col("r.v").as("vb"))
      assert(exchanges(joined) == 0,
        s"co-located join must not shuffle:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      val want = (0 until 400).map(i => (s"k$i", s"a$i", s"b$i")).sortBy(_._1)
      assert(got.toSeq == want)
    }
  }

  test("pk aggregation including __bucket plans with zero Exchange") {
    val dirA = mkTable(300, 8, "a")
    withSpjConfs {
      val a = UpsertBucketSource.read(spark, dirA)
      val agg = a.groupBy(col("__bucket"), col("k"))
        .agg(count(lit(1)).as("ct"))
      assert(exchanges(agg) == 0,
        s"bucket-aligned aggregate must not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.collect().length == 300)
      assert(agg.select(sum("ct")).as[Long].head() == 300L)
    }
  }

  test("mismatched bucket counts fall back to a shuffle join, rows still exact") {
    val dirA = mkTable(200, 8, "a")
    val dirC = mkTable(200, 4, "c")
    withSpjConfs {
      val a = UpsertBucketSource.read(spark, dirA).as("a")
      val c = UpsertBucketSource.read(spark, dirC).as("c")
      // bucket ids differ between layouts — join on pk alone
      val joined = a.join(c, col("a.k") === col("c.k"))
        .select(col("a.k"), col("c.v"))
      assert(exchanges(joined) > 0, "mismatched layouts must shuffle")
      assert(joined.count() == 200)
      // the helper must detect the mismatch and drop the bucket
      // equality — with it, the same key hashes to different bucket
      // ids and matching rows would silently vanish
      val viaHelper = graft.io.Bucketing
        .colocatedJoin(spark, dirA, dirC, Seq("k" -> "k"))
      assert(viaHelper.count() == 200,
        "helper must not lose rows across mismatched layouts")
    }
  }

  test("a pushed __bucket filter prunes partitions at plan time (generic point get)") {
    val dir = mkTable(400, 8, "a")
    val key = "k123"
    val b = Upsert.bucketOfKey(key, 8)
    val get = UpsertBucketSource.read(spark, dir)
      .filter(col("__bucket") === b && col("k") === key)
    // partition-level prune: only the key's bucket is planned
    assert(get.rdd.getNumPartitions == 1,
      s"expected 1 planned bucket:\n${get.queryExecution.executedPlan}")
    assert(get.select("v").as[String].collect().toSeq == Seq("a123"))
    // IN-list across two buckets
    val keys = Seq("k5", "k17")
    val bs = keys.map(Upsert.bucketOfKey(_, 8)).distinct
    val multi = UpsertBucketSource.read(spark, dir)
      .filter(col("__bucket").isin(bs: _*) && col("k").isin(keys: _*))
    assert(multi.rdd.getNumPartitions == bs.size)
    assert(multi.select("k").as[String].collect().sorted.toSeq == keys.sorted)
    // an all-pruned scan returns empty without a zero-partition grouping
    val none = UpsertBucketSource.read(spark, dir).filter(col("__bucket") === -1)
    assert(none.count() == 0)
  }

  test("j_snapshot_diff head: two-generation diff joins with zero Exchange") {
    val diff = graft.ops.Relational.jSnapshotDiff(spark, sf)
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"snapshot diff must co-locate, not shuffle:\n$plan")
    val rows = diff.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 97 == 0)
      // floor((v+1)*100) - floor(v*100) is 100 up to one ulp of double
      // rounding; the ORACLE pins the exact engine-identical values
      assert(math.abs(r.getLong(2) - r.getLong(1) - 100L) <= 1L,
        s"diff must show the +1.00 correction: $r")
    }
  }

  test("column pruning and filters reach the DSv2 scan; __bucket values match placement") {
    val dirA = mkTable(100, 8, "a")
    val a = UpsertBucketSource.read(spark, dirA)
    val narrow = a.filter(col("k") === "k7").select("k", "v")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(narrow.collect().map(_.getString(1)).toSeq == Seq("a7"))
    // the reported bucket column equals the driver-side placement hash
    val rows = a.select(col("k"), col("__bucket")).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getInt(1) == Upsert.bucketOfKey(r.getString(0), 8),
        s"reported bucket diverges from placement for ${r.getString(0)}\n$plan")
    }
    // upsert semantics survive the new reader: a second-version row wins
    Upsert.merge(spark, dirA,
      Seq(("k7", 2L, "A7")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver", numBuckets = 8)
    val after = UpsertBucketSource.read(spark, dirA)
      .filter(col("k") === "k7").select("v").as[String].collect()
    assert(after.toSeq == Seq("A7"))
  }

  test("REGRESSION: two DSv2 scans with DIFFERENT pushed predicates in one query stay exact") {
    // each scan build mutates the hadoop conf it snapshots (read
    // schema + parquet filter predicate); sharing one conf object let
    // scan B's predicate — naming a column scan A's files lack — ride
    // into scan A's tasks and prune every row group: the join silently
    // returned ZERO rows. ParquetScanShim.hadoopConf now clones per
    // scan (Spark's own newHadoopConf pattern).
    val dirA = java.nio.file.Files.createTempDirectory("spj_conf_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("spj_conf_b").toString
    Upsert.merge(spark, dirA, spark.range(2000).select(
      col("id").as("a_key"), lit(1L).as("ver"), (col("id") * 2).as("a_val")),
      pk = Seq("a_key"), versionCol = "ver", numBuckets = 4)
    Upsert.merge(spark, dirB, spark.range(2000).select(
      col("id").as("b_key"), lit(1L).as("ver"), (col("id") % 7).as("b_tag")),
      pk = Seq("b_key"), versionCol = "ver", numBuckets = 4)
    val a = UpsertBucketSource.read(spark, dirA).filter(col("a_val") > 100)
    val b = UpsertBucketSource.read(spark, dirB).filter(col("b_tag") === 3)
    // force the sort-merge path (a broadcast build side reads through a
    // different code path and masked the original bug)
    val joined = a.hint("merge").join(b, col("a_key") === col("b_key"))
    val got = joined.count()
    val want = (0 until 2000).count(i => i * 2 > 100 && i % 7 == 3)
    assert(got == want.toLong, s"pushed-predicate cross-talk: got $got want $want")
  }
}
