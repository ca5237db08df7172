package graft

import java.nio.file.Files
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.io.{Maintenance, MergeOnRead, Upsert}

/** The threshold policy (VERDICT r5 #4): below thresholds Maintenance
  * is a job-free no-op a scheduler can afford after every batch; above
  * them it runs exactly the needed primitive and converges back to
  * healthy. Content is never touched — only layout.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  @volatile private var jobs = 0
  private val listener = new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
  }
  private def jobsDuring[T](body: => T): (T, Int) = {
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs = 0
      val r = body
      Thread.sleep(1500) // listener bus is async
      (r, jobs)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("healthy upsert table: empty action list and ZERO Spark jobs") {
    val dir = Files.createTempDirectory("maint_noop").toString
    Upsert.merge(spark, dir,
      (1 to 50).map(i => (s"k$i", 1L, i)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver")
    val gen = Upsert.currentManifest(spark, dir).get.gen
    val (actions, n) = jobsDuring {
      Maintenance.runUpsert(spark, dir, pk = Seq("id"))
    }
    assert(actions.isEmpty, s"healthy table acted: $actions")
    assert(n == 0, s"no-op path must be job-free, ran $n jobs")
    assert(Upsert.currentManifest(spark, dir).get.gen == gen,
      "no-op must not commit a manifest")
  }

  test("over-full bucket + dominant garbage: compacts and vacuums, content exact, " +
       "then converges to a job-free no-op") {
    val dir = Files.createTempDirectory("maint_act").toString
    // 12 bloom point-merges of DISTINCT keys that hash into the same
    // bucket: each key misses every existing file's bloom, so the merge
    // appends one file and preserves the rest — the bucket accumulates
    // one file per merge (and each superseded generation leaves garbage)
    val target = Upsert.bucketOfKey("k1", Upsert.DefaultNumBuckets)
    val sameBucket = (1 to 5000).map(i => s"n$i")
      .filter(k => Upsert.bucketOfKey(k, Upsert.DefaultNumBuckets) == target)
      .take(12)
    assert(sameBucket.size == 12, "need 12 same-bucket keys")
    Upsert.merge(spark, dir,
      (1 to 40).map(i => (s"k$i", 1L, 0)).toDF("id", "ver", "v"),
      pk = Seq("id"), versionCol = "ver", bloom = true)
    sameBucket.zipWithIndex.foreach { case (k, i) =>
      Upsert.merge(spark, dir, Seq((k, 1L, i)).toDF("id", "ver", "v"),
        pk = Seq("id"), versionCol = "ver", bloom = true)
    }
    val before = Upsert.read(spark, dir)
      .as[(String, Long, Int)].collect().toSet
    assert(Upsert.currentManifest(spark, dir).get.files.exists(_._2.size > 8),
      "setup must over-fill a bucket")

    // keepManifests=1 (offline retention): with the default 2 the files
    // the compaction supersedes stay referenced by the previous
    // snapshot, and freeableBy correctly reports nothing to vacuum yet
    val policy = Maintenance.Policy(maxReclaimableRatio = 0.1,
      minReclaimableBytes = 0L, keepManifests = 1)
    val actions = Maintenance.runUpsert(spark, dir, pk = Seq("id"),
      policy = policy, bloom = true)
    assert(actions.exists(_.startsWith("compactBuckets")), s"got $actions")
    assert(actions.exists(_.startsWith("vacuum")), s"got $actions")
    assert(Upsert.currentManifest(spark, dir).get.files.forall(_._2.size <= 8))
    val after = Upsert.read(spark, dir)
      .as[(String, Long, Int)].collect().toSet
    assert(after == before, "maintenance changed table content")

    // converged: the very next pass is a healthy job-free no-op
    val (again, n) = jobsDuring {
      Maintenance.runUpsert(spark, dir, pk = Seq("id"), policy = policy, bloom = true)
    }
    assert(again.isEmpty, s"policy did not converge: $again")
    assert(n == 0, s"converged pass must be job-free, ran $n jobs")
  }

  test("MOR backlog: healthy below maxDeltaBatches (job-free), folds above it, " +
       "resolved content exact") {
    val dir = Files.createTempDirectory("maint_mor").toString
    def wave(v: Long) = (1 to 20).map(i => (s"k$i", v, s"p$i-$v"))
      .toDF("id", "ver", "payload")
    (1L to 3L).foreach(v => MergeOnRead.merge(spark, dir, wave(v)))
    val policy = Maintenance.Policy(maxDeltaBatches = 5)
    val (healthy, n) = jobsDuring {
      Maintenance.runMor(spark, dir, Seq("id"), "ver", policy = policy)
    }
    assert(healthy.isEmpty && n == 0,
      s"3 batches under a 5-batch policy must be a job-free no-op: $healthy / $n jobs")

    (4L to 7L).foreach(v => MergeOnRead.merge(spark, dir, wave(v)))
    val before = MergeOnRead.read(spark, dir, Seq("id"), "ver")
      .as[(String, Long, String)].collect().toSet
    val acted = Maintenance.runMor(spark, dir, Seq("id"), "ver", policy = policy)
    assert(acted.exists(_.startsWith("compact")), s"got $acted")
    assert(MergeOnRead.stats(spark, dir).liveDeltaBatches == 0,
      "backlog must be folded")
    val after = MergeOnRead.read(spark, dir, Seq("id"), "ver")
      .as[(String, Long, String)].collect().toSet
    assert(after == before, "compaction changed resolved content")

    // layout dispatch: run() finds the MOR table by its delta/ child
    val again = Maintenance.run(spark, dir, Seq("id"), "ver", policy)
    assert(again.isEmpty, s"healthy MOR table acted via run(): $again")
  }

  test("MOR policy pass binds to the RECORDED contract (path-only scheduler shape)") {
    // a table whose contract records a deleteFlagCol: a policy pass
    // that knows only the path (deleteFlagCol default None) must fold
    // under the recorded contract instead of refusing on a
    // None-vs-recorded contradiction — and the delete semantics hold
    val dir = Files.createTempDirectory("maint_mor_ctr").toString + "/t"
    MergeOnRead.merge(spark, dir,
      (1 to 20).map(i => (s"k$i", 1L, s"p$i", "insert"))
        .toDF("id", "ver", "payload", "op"))
    MergeOnRead.recordContract(spark, dir, Seq("id"), "ver", Some("op"),
      graft.io.Upsert.DefaultNumBuckets)
    MergeOnRead.merge(spark, dir,
      Seq(("k3", 2L, "p3", "delete")).toDF("id", "ver", "payload", "op"))
    // path-only pass: pk/versionCol supplied, deleteFlagCol NOT
    val acted = Maintenance.runMor(spark, dir, Seq("id"), "ver",
      policy = Maintenance.Policy(maxDeltaBatches = 0))
    assert(acted.exists(_.startsWith("compact")), s"got $acted")
    val ids = MergeOnRead.read(spark, dir, Seq("id"), "ver", Some("op"))
      .select("id").as[String].collect().toSet
    assert(!ids.contains("k3") && ids.size == 19,
      s"delete must survive the contract-bound fold: $ids")
  }
}
