package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.io.{Bucketing, Maintenance, Upsert}
import graft.sources.UpsertBucketSource

/** Bucket-health policy (VERDICT r8 #6): a bucket that outgrew the
  * per-task scan budget triggers ONE converging re-placement under the
  * writer lease — readers never see a torn layout (MVCC), placement
  * props survive, and SPJ joins against the new layout still co-locate.
  * The trigger is ABSOLUTE bucket bytes, not skew-vs-median: a hot
  * key-mass keeps the same multiple of the median under any modulus,
  * so a relative trigger would re-fire forever.
  */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  /** 4-bucket table where one bucket carries ~4× the others: uniform
    * keys plus a key set selected to collide in bucket 1 (mod 4).
    */
  private def mkSkewed(tag: String): String = {
    val dir = Files.createTempDirectory(s"rebucket_$tag").toString
    val uniform = spark.range(900).select(concat(lit("u"), col("id")).as("k"))
    val hot = spark.range(20000)
      .select(concat(lit("h"), col("id")).as("k"))
      .filter(pmod(xxhash64(col("k")), lit(4)) === 1).limit(900)
    val df = uniform.unionAll(hot).select(col("k"), lit(1L).as("ver"),
      concat(lit("pay-"), col("k"), lit("-" + "x" * 40)).as("v"))
    Upsert.merge(spark, dir, df, pk = Seq("k"), versionCol = "ver",
      numBuckets = 4, bloom = true)
    dir
  }

  private def rows(dir: String) =
    Upsert.read(spark, dir).select("k", "v").as[(String, String)].collect().toSet

  test("oversized bucket triggers exactly one converging rebucket; rows, MVCC, lookups intact") {
    val dir = mkSkewed("a")
    val sizes = Upsert.bucketBytes(spark, dir)
    val biggest = sizes.values.max
    assert(biggest > 2 * sizes.values.toSeq.sorted.apply(sizes.size / 2),
      "setup must be skewed")
    val before = rows(dir)
    // resolve a reader plan on the OLD generation before the rebucket
    val preRead = Upsert.read(spark, dir).select("k")
    val policy = Maintenance.Policy(
      maxFilesPerBucket = 10000, minReclaimableBytes = Long.MaxValue,
      maxBucketBytes = (biggest * 0.6).toLong)
    val a1 = Maintenance.runUpsert(spark, dir, pk = Seq("k"), policy)
    assert(a1.size == 1 && a1.head.startsWith("rebucket"), s"got $a1")
    // converged: the policy pass is now a no-op
    val a2 = Maintenance.runUpsert(spark, dir, pk = Seq("k"), policy)
    assert(a2.isEmpty, s"second pass must be a no-op, got $a2")
    val newN = Upsert.currentManifest(spark, dir).get.numBuckets(4)
    assert(newN > 4, s"numBuckets must grow, got $newN")
    assert(Upsert.bucketBytes(spark, dir).values.max <= policy.maxBucketBytes,
      "largest bucket must be back under target")
    // content identical; placement follows the new modulus exactly
    assert(rows(dir) == before)
    UpsertBucketSource.read(spark, dir).select("k", "__bucket").collect()
      .foreach(r => assert(r.getInt(1) == Upsert.bucketOfKey(r.getString(0), newN)))
    // the pre-rebucket reader still completes against its snapshot
    assert(preRead.count() == before.size)
    // point lookups resolve through the NEW recorded bucket count
    val someKey = before.head._1
    assert(Upsert.lookup(spark, dir, "k", Seq(someKey)).count() == 1)
    // placement contract survived: a normal merge still lands
    Upsert.merge(spark, dir, Seq((someKey, 2L, "v2")).toDF("k", "ver", "v"),
      pk = Seq("k"), versionCol = "ver")
    assert(Upsert.read(spark, dir).filter(col("k") === someKey)
      .select("v").as[String].head() == "v2")
  }

  test("SPJ joins against the re-placed layout still co-locate with zero Exchange") {
    val dirA = mkSkewed("b1")
    val dirB = mkSkewed("b2")
    val target = (Upsert.bucketBytes(spark, dirA).values.max * 0.6).toLong
    val policy = Maintenance.Policy(
      maxFilesPerBucket = 10000, minReclaimableBytes = Long.MaxValue,
      maxBucketBytes = target)
    assert(Maintenance.runUpsert(spark, dirA, Seq("k"), policy).nonEmpty)
    assert(Maintenance.runUpsert(spark, dirB, Seq("k"), policy).nonEmpty)
    val nA = Upsert.currentManifest(spark, dirA).get.numBuckets(4)
    val nB = Upsert.currentManifest(spark, dirB).get.numBuckets(4)
    assert(nA == nB, s"identical tables must rebucket identically ($nA vs $nB)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = Bucketing.colocatedJoin(spark, dirA, dirB, Seq("k" -> "k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"rebucketed co-located join must not shuffle:\n$plan")
      assert(j.count() == rows(dirA).size)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
