package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.core.{Mv, MvAgg, MvDef, MvRegistry}

/** Transparent MV rewrite (core.MvRewrite): matching aggregates
  * re-target to the rollup table, everything else is untouched, and a
  * rewritten plan returns bit-identical rows to the unrewritten one.
  */
class MvSpec extends SparkSpec {
  import spark.implicits._

  private val srcDir = Files.createTempDirectory("mv_src").toString + "/fact.parquet"
  private val mvDir = Files.createTempDirectory("mv_tab").toString + "/rollup.parquet"

  private lazy val mvDef: MvDef = {
    val rows = (0 until 5000).map { i =>
      (s"k${i % 7}", s"g${i % 3}", i % 100, (i % 17).toDouble / 4.0, s"p$i")
    }.toDF("k1", "k2", "vi", "vd", "payload")
    rows.write.mode("overwrite").parquet(srcDir)
    val d = MvDef("fact_rollup", srcDir, mvDir,
      dims = Seq("k1", "k2"),
      aggs = Seq(MvAgg("sum", "vi", "sum_vi"), MvAgg("sum", "vd", "sum_vd"),
        MvAgg("count", "*", "cnt"), MvAgg("min", "vi", "min_vi"),
        MvAgg("max", "vd", "max_vd"),
        // per-column non-null count: what integral avg derives from
        // (parquet schemas are always nullable, so count(*) never
        // substitutes)
        MvAgg("count", "vi", "cnt_vi")))
    Mv.build(spark, d)
    d
  }

  private def leafPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }

  /** Run `q` twice — with the MV registered and without — assert the
    * registered plan scans the MV (not the source) and both results
    * match exactly.
    */
  private def assertRewrites(q: => DataFrame): Unit = {
    MvRegistry.register(spark, mvDef)
    try {
      val on = q
      val onLeaves = leafPaths(on)
      assert(onLeaves.exists(_.contains("rollup.parquet")), s"expected MV scan, got $onLeaves")
      assert(!onLeaves.exists(_.contains("fact.parquet")), s"source scan survived: $onLeaves")
      val got = on.collect().map(_.mkString("|")).sorted.toSeq
      MvRegistry.clear(spark)
      val want = q.collect().map(_.mkString("|")).sorted.toSeq
      assert(got == want)
    } finally MvRegistry.clear(spark)
  }

  private def assertUntouched(q: => DataFrame): Unit = {
    MvRegistry.register(spark, mvDef)
    try {
      val leaves = leafPaths(q)
      assert(!leaves.exists(_.contains("rollup.parquet")),
        s"must NOT rewrite, but plan scans MV: $leaves")
    } finally MvRegistry.clear(spark)
  }

  test("full-grain query rewrites to the MV and matches the fact-scan answer") {
    assertRewrites {
      spark.read.parquet(srcDir).groupBy("k1", "k2")
        .agg(sum("vi").as("svi"), count(lit(1)).as("c"),
          min("vi").as("mn"), max("vd").as("mx"))
    }
  }

  test("rollup to a dim subset re-aggregates the MV (sum→sum, count→sum, min/max)") {
    assertRewrites {
      spark.read.parquet(srcDir).groupBy("k1")
        .agg(sum("vd").as("svd"), count(lit(1)).as("c"), max("vd").as("mx"))
    }
  }

  test("global aggregate (no grouping): count coalesces, never null") {
    assertRewrites {
      spark.read.parquet(srcDir)
        .agg(count(lit(1)).as("c"), sum("vi").as("svi"))
    }
    // and on an EMPTY matching filter the count is 0, not null
    MvRegistry.register(spark, mvDef)
    try {
      val df = spark.read.parquet(srcDir).filter(col("k1") === "nope")
        .agg(count(lit(1)).as("c"))
      assert(leafPaths(df).exists(_.contains("rollup.parquet")))
      assert(df.as[Long].head() == 0L)
    } finally MvRegistry.clear(spark)
  }

  test("dim-only filters rewrite and apply to MV rows") {
    assertRewrites {
      spark.read.parquet(srcDir).filter(col("k2") === "g1")
        .groupBy("k1").agg(sum("vi").as("svi"))
    }
  }

  test("non-rewritable shapes stay on the fact scan") {
    // measure the MV lacks
    assertUntouched(
      spark.read.parquet(srcDir).groupBy("k1").agg(sum("payload").as("s")))
    // distinct agg
    assertUntouched(
      spark.read.parquet(srcDir).groupBy("k1").agg(countDistinct("vi").as("c")))
    // filter on a non-dim column
    assertUntouched(
      spark.read.parquet(srcDir).filter(col("vi") > 50)
        .groupBy("k1").agg(count(lit(1)).as("c")))
    // expression grouping
    assertUntouched(
      spark.read.parquet(srcDir).groupBy(upper(col("k1")).as("K"))
        .agg(count(lit(1)).as("c")))
    // avg over a FLOAT column never rewrites (partial sums are
    // order-sensitive; only integral avg is exact under re-aggregation)
    assertUntouched(
      spark.read.parquet(srcDir).groupBy("k1").agg(avg("vd").as("a")))
  }

  test("integral avg rewrites as sum-of-sums over sum-of-counts, bit-exact") {
    assertRewrites {
      spark.read.parquet(srcDir).groupBy("k1")
        .agg(avg("vi").as("avg_vi"), count(lit(1)).as("c"))
    }
  }

  test("decimal sums never rewrite (re-aggregation would widen the type)") {
    val decSrc = Files.createTempDirectory("mv_dec").toString + "/f.parquet"
    val decMv = Files.createTempDirectory("mv_dec").toString + "/m.parquet"
    spark.range(100).select((col("id") % 5).cast("string").as("k"),
      col("id").cast("decimal(10,2)").as("dv"))
      .write.mode("overwrite").parquet(decSrc)
    val d = MvDef("dec_rollup", decSrc, decMv,
      dims = Seq("k"), aggs = Seq(MvAgg("sum", "dv", "sum_dv")))
    Mv.build(spark, d)
    MvRegistry.register(spark, d)
    try {
      val q = spark.read.parquet(decSrc).groupBy("k").agg(sum("dv").as("s"))
      assert(!leafPaths(q).exists(_.contains("/m.parquet")))
    } finally MvRegistry.clear(spark)
  }

  test("ensure is source-keyed: a regenerated source with the same row " +
       "count but different values rebuilds instead of serving stale rows, " +
       "and a cache hit launches ZERO Spark jobs") {
    val src = Files.createTempDirectory("mv_ck").toString + "/f.parquet"
    val mvp = Files.createTempDirectory("mv_ck").toString + "/m.parquet"
    def write(mult: Int) = spark.range(100)
      .select((col("id") % 5).cast("string").as("k"), (col("id") * mult).as("v"))
      .write.mode("overwrite").parquet(src)
    write(1)
    val d = MvDef("ck_rollup", src, mvp,
      dims = Seq("k"), aggs = Seq(MvAgg("sum", "v", "sum_v")))
    Mv.ensure(spark, d)
    val v1 = spark.read.parquet(mvp).agg(sum("sum_v")).head().getLong(0)
    write(2) // same 100 rows, doubled values — count-keying would miss this
    Mv.ensure(spark, d)
    val v2 = spark.read.parquet(mvp).agg(sum("sum_v")).head().getLong(0)
    assert(v2 == 2 * v1, s"stale MV served after content drift: $v1 -> $v2")
    // ADVICE r7 #3: the key is file metadata, not a row scan — a THIRD
    // ensure over unchanged source must launch no Spark job at all
    val sc = spark.sparkContext
    val statusStore = sc.statusTracker
    val before = statusStore.getJobIdsForGroup(null).length
    Mv.ensure(spark, d)
    val after = statusStore.getJobIdsForGroup(null).length
    assert(after == before, s"ensure cache hit ran ${after - before} Spark job(s)")
  }

  test("MV over an upsert fact composes with IncrementalDws: refresh, re-register, exact") {
    import graft.io.Upsert
    import graft.rtdw.IncrementalDws
    val factDir = Files.createTempDirectory("mv_fact").toString
    val dwsDir = Files.createTempDirectory("mv_dws").toString
    def q: DataFrame = Upsert.read(spark, factDir).groupBy("province")
      .agg(sum("amount").as("amount"), count(lit(1)).as("row_ct"))
    def checkServes(): Unit = {
      val on = q
      assert(leafPaths(on).forall(_.contains(dwsDir)),
        s"must serve from the DWS rollup: ${leafPaths(on)}")
      val got = on.collect().map(_.mkString("|")).sorted.toSeq
      MvRegistry.clear(spark)
      val want = q.collect().map(_.mkString("|")).sorted.toSeq
      assert(got == want)
    }

    Upsert.merge(spark,  factDir,
      (1 to 100).map(i => (s"o$i", 1L, s"p${i % 5}", (i * 10).toLong))
        .toDF("id", "ver", "province", "amount"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    IncrementalDws.refresh(spark, factDir, dwsDir, Seq("province"), Seq("amount"))
    val mv = MvDef("prov_rollup", factDir, s"$dwsDir/table",
      dims = Seq("province"),
      aggs = Seq(MvAgg("sum", "amount", "amount"), MvAgg("count", "*", "row_ct")))
    MvRegistry.register(spark, mv)
    try checkServes() finally MvRegistry.clear(spark)

    // updates + new keys ride the change feed; refresh folds the delta,
    // re-register picks up the new snapshot, the rewrite stays exact
    Upsert.merge(spark, factDir,
      Seq(("o1", 2L, "p1", 9999L), ("o200", 1L, "p9", 77L))
        .toDF("id", "ver", "province", "amount"),
      pk = Seq("id"), versionCol = "ver", changeLog = true)
    IncrementalDws.refresh(spark, factDir, dwsDir, Seq("province"), Seq("amount"))
    MvRegistry.register(spark, mv)
    try checkServes() finally MvRegistry.clear(spark)
  }

  test("rewritten output composes downstream (join + sort on the agg result)") {
    MvRegistry.register(spark, mvDef)
    try {
      val aggDf = spark.read.parquet(srcDir).groupBy("k1")
        .agg(sum("vi").as("svi"))
      val names = Seq(("k0", "zero"), ("k1", "one")).toDF("k1", "label")
      val joined = aggDf.join(names, "k1").orderBy(desc("svi"))
      assert(leafPaths(joined).exists(_.contains("rollup.parquet")))
      val got = joined.collect().map(_.mkString("|")).toSeq
      MvRegistry.clear(spark)
      val want = spark.read.parquet(srcDir).groupBy("k1")
        .agg(sum("vi").as("svi")).join(names, "k1").orderBy(desc("svi"))
        .collect().map(_.mkString("|")).toSeq
      assert(got == want)
    } finally MvRegistry.clear(spark)
  }
}
