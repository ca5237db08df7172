package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** The build-once marker must key on BOTH the source fingerprint and the
  * build RECIPE (VERDICT r9 #2): a head whose build closure changes —
  * new zone columns, different clustering — over UNCHANGED testdata must
  * rebuild instead of serving the stale layout (the `a_meta_agg` `_v2`
  * hand-rename was this hazard hit in anger). And a cache hit must stay
  * free: same source + same recipe launches ZERO Spark jobs.
  */
class BuildMarkerSpec extends SparkSpec {
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

  private def freshSource(): String = {
    val dir = java.nio.file.Files.createTempDirectory("marker_src_").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("same source + same recipe: build once, then zero jobs on re-ensure") {
    val src = freshSource()
    val prefix = java.nio.file.Files.createTempDirectory("marker_tbl_").toString + "/t_"
    var builds = 0
    def ensure(): String =
      graft.io.Tables.ensureBuilt(spark, prefix, src, recipe = "zones(k) v1") { root =>
        builds += 1
        spark.read.parquet(s"$src/events.parquet").write.parquet(s"$root/data")
      }
    val root = ensure()
    assert(builds == 1)
    val (root2, hitJobs) = jobsDuring(ensure())
    assert(root2 == root)
    assert(builds == 1, "cache hit must not rebuild")
    assert(hitJobs == 0, s"cache hit launched $hitJobs Spark jobs; must be 0")
  }

  test("same source + EDITED recipe: rebuilds automatically (no hand-renamed roots)") {
    val src = freshSource()
    val prefix = java.nio.file.Files.createTempDirectory("marker_tbl_").toString + "/t_"
    var builds = 0
    def ensure(recipe: String): String =
      graft.io.Tables.ensureBuilt(spark, prefix, src, recipe = recipe) { root =>
        builds += 1
        val sub = s"$root/data_$builds"
        spark.read.parquet(s"$src/events.parquet").write.parquet(sub)
      }
    ensure("zones(k) v1")
    assert(builds == 1)
    ensure("zones(k,v) v2") // the closure's params changed
    assert(builds == 2, "edited recipe over unchanged source must rebuild")
    ensure("zones(k,v) v2")
    assert(builds == 2, "new recipe then stabilizes as a normal cache hit")
    // a rebuild WIPES the root first (mutation-built heads must never
    // double-apply onto stale state), so the v1 marker is gone too: a
    // reverted recipe rebuilds cleanly rather than serving anything stale
    ensure("zones(k) v1")
    assert(builds == 3)
  }

  test("regenerated source under the same recipe still rebuilds (r7 guarantee kept)") {
    val src = freshSource()
    val prefix = java.nio.file.Files.createTempDirectory("marker_tbl_").toString + "/t_"
    var builds = 0
    def ensure(): String =
      graft.io.Tables.ensureBuilt(spark, prefix, src, recipe = "v1") { root =>
        builds += 1
        val sub = s"$root/data_$builds"
        spark.read.parquet(s"$src/events.parquet").write.parquet(sub)
      }
    ensure(); assert(builds == 1)
    // regenerate the source: different content → different file sizes/footer
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$src/events.parquet")
    ensure(); assert(builds == 2, "regenerated source must rebuild")
  }

  test("MV ensure keys on the MvDef: edited definition rebuilds over unchanged source") {
    val src = freshSource()
    val mvDir = java.nio.file.Files.createTempDirectory("marker_mv_").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def markers(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(mvDir)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("_built_")).toSet
    }
    val d1 = graft.core.MvDef("mv_marker_spec", s"$src/events.parquet", mvDir,
      dims = Seq("v"), aggs = Seq(graft.core.MvAgg("count", "k", "ct")))
    graft.core.Mv.ensure(spark, d1)
    val m1 = markers()
    assert(m1.size == 1)
    val d2 = d1.copy(aggs = Seq(graft.core.MvAgg("sum", "k", "sum_k")))
    graft.core.Mv.ensure(spark, d2)
    // the overwrite build wipes the dir (old marker included); the NEW
    // marker name proves the edited def rebuilt instead of cache-hitting
    val m2 = markers()
    assert(m2.size == 1 && m2 != m1,
      "edited MvDef over unchanged source must lay a NEW marker (rebuild)")
    assert(spark.read.parquet(mvDir).columns.contains("sum_k"),
      "the rebuilt MV must carry the edited definition's column")
  }
}
